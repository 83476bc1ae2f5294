from .batch import GraphBatch, pad_graph_batch  # noqa: F401
from .loaders import (  # noqa: F401
    SaintRandomWalkLoader,
    NeighborBatchLoader,
    FullGraphLoader,
)
