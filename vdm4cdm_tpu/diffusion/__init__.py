from .schedule import NoiseSchedule, make_schedule
from .vdm import VDM, VDMLosses
from .ddnm import ddnm_sample

__all__ = ["NoiseSchedule", "make_schedule", "VDM", "VDMLosses", "ddnm_sample"]
