from .averager_zoo import AVERAGER_ZOO, run_variant  # noqa: F401
from .chain import ChainConfig, DspChain  # noqa: F401
from .adaptive import AdaptiveFir, lms_train_step, make_sharded_train_step  # noqa: F401
from .wideband import WidebandConfig, WidebandFmReceiver  # noqa: F401
from .ofdm import OfdmConfig, OfdmReceiver  # noqa: F401
from .modem import ModemConfig  # noqa: F401
from . import modem  # noqa: F401
from .radar import RadarConfig  # noqa: F401
from . import radar  # noqa: F401
from .beamform import ArrayConfig  # noqa: F401
from . import beamform  # noqa: F401
from .tracking import TrackerConfig  # noqa: F401
from . import tracking  # noqa: F401

__all__ = [
    "ArrayConfig",
    "beamform",
    "TrackerConfig",
    "tracking",
    "ModemConfig",
    "modem",
    "RadarConfig",
    "radar",
    "AVERAGER_ZOO",
    "run_variant",
    "ChainConfig",
    "DspChain",
    "AdaptiveFir",
    "lms_train_step",
    "make_sharded_train_step",
    "WidebandConfig",
    "WidebandFmReceiver",
    "OfdmConfig",
    "OfdmReceiver",
]
