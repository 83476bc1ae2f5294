"""Import-layout parity alias for the reference's ``biomedkg.factory``."""

from .models.factory import (FusionFactory, GAE,  # noqa: F401
                             KGEModelFactory, create_kge_model)
