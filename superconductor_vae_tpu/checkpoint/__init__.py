from .io import (save_checkpoint, load_checkpoint, latest_checkpoint,
                 restore_opt_state, ckpt_skew_transform)
from .manifest import build_manifest, check_manifest_drift
from .migrate import auto_migrate
