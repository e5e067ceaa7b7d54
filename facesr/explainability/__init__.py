"""Standalone explainability package (reference `src/explainability/`).

The reference duplicates Grad-CAM across `src/evaluation/explainability.py`
and `src/explainability/gradcam.py` (SURVEY.md §1); here both import
surfaces share one implementation.
"""

from facesr.evaluation.explainability import (
    FACE_REGIONS,
    GradCAM,
    AttentionExtractor,
    apply_heatmap,
    create_gradcam_visualization,
    create_attention_report,
    visualize_attention_flow,
)

__all__ = [
    "FACE_REGIONS",
    "GradCAM",
    "AttentionExtractor",
    "apply_heatmap",
    "create_gradcam_visualization",
    "create_attention_report",
    "visualize_attention_flow",
]
