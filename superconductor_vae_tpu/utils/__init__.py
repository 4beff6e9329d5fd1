from .env_config import detect_environment, EnvironmentInfo
from .profiling import PhaseTimer, trace_context
