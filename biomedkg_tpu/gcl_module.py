"""Import-layout parity alias for the reference's ``biomedkg.gcl_module``."""

from .training.gcl_module import (BaseGCL, DGIModule, GGDModule,  # noqa: F401
                                  GRACEModule, create_gcl_model,
                                  load_gcl_module)
