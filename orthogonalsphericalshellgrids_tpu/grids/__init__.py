from . import geometry, latlon, tripolar
