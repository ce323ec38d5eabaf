from .registry import Context, Model, Pipeline
from .snapshot import scd2_merge

__all__ = ["Context", "Model", "Pipeline", "scd2_merge"]
