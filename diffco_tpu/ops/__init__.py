from .fused_score import (
    polyharmonic_score, rq_score, fused_score_available,
)
