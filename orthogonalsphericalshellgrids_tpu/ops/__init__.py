from . import location, zipper
