"""Import-layout parity alias: the reference exposes ``biomedkg.kge_module``
(/root/reference/biomedkg/kge_module.py); users switching port their imports
verbatim."""

from .training.kge_module import (KGEModule, TrainState,  # noqa: F401
                                  load_kge_module)
