from .cvar import CVar, CVarSystem, cvars
from .log import get_logger
from .timer import FrameTimer, PassTimers
