from . import losses, masks, metrics, schedules
