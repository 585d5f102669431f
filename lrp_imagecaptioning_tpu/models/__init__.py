from . import core, encoders, gridtd
