from .mesh import make_mesh  # noqa: F401
from .dp import make_dp_train_step, stack_batches  # noqa: F401
from .sharding import kge_param_shardings  # noqa: F401
