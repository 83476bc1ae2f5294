from .segment import (  # noqa: F401
    scatter_add,
    scatter_max,
    segment_softmax,
    per_dst_relation_counts,
)
from .relmatmul import relation_matmul  # noqa: F401
