from .schedule import poly_lr_schedule
