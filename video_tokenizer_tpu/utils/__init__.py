from . import common  # noqa: F401
from . import checkpoint  # noqa: F401
from .common import (  # noqa: F401
    Averager,
    EpochTimer,
    compute_num_params,
    ensure_path,
    psnr_from_mse,
    repeat_to_m_frames,
    set_logger,
)
