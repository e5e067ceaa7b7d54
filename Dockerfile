# facesr — TPU-native face super-resolution framework.
# Mirrors the reference deployment surface (reference Dockerfile:5 uses a
# CUDA torch base; the TPU equivalent is a JAX TPU image).
FROM python:3.12-slim

WORKDIR /workspace

RUN apt-get update && apt-get install -y --no-install-recommends \
    libgl1 libglib2.0-0 && rm -rf /var/lib/apt/lists/*

COPY requirements.txt .
# On Cloud TPU VMs install jax[tpu] instead:
#   pip install 'jax[tpu]' -f https://storage.googleapis.com/jax-releases/libtpu_releases.html
RUN pip install --no-cache-dir -r requirements.txt

COPY facesr/ facesr/
COPY scripts/ scripts/
COPY app/ app/
COPY configs/ configs/
COPY bench.py pyproject.toml ./

ENV PYTHONPATH=/workspace
EXPOSE 7860

CMD ["python", "scripts/train.py", "--config", "configs/stages/stage1_psnr_config.yaml"]
