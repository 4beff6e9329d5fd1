from .config import ModelConfig
from .encoder import MaterialsEncoder
from .decoder import FormulaDecoder
