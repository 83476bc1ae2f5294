from .triplet import TripletGraph  # noqa: F401
from .primekg import PrimeKG  # noqa: F401
from .dpi import DPI  # noqa: F401
from .split import random_link_split  # noqa: F401
from . import node_encoders as node  # noqa: F401
