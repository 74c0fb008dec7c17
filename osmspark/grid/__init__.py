from . import hexgrid, s2
