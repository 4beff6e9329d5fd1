from .env_config import detect_environment, EnvironmentInfo
from .npz import as_f32
from .profiling import PhaseTimer, trace_context
