from .encoders import RGCN, RGAT, GCNEncoder  # noqa: F401
from .decoders import TransE, DistMult, ComplEx, RotatE  # noqa: F401
from .fusion import AttentionFusion, ReDAF, PositionalEncoding  # noqa: F401
from .gcl import DGI, GRACE, GGD  # noqa: F401
from .factory import KGEModelFactory, FusionFactory, GAE  # noqa: F401
