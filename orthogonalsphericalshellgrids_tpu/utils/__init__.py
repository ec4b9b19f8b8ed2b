from . import output, simulation
from .output import FieldTimeSeries, OutputWriter
from .simulation import IterationInterval, Simulation, TimeInterval, TimeStepWizard, progress_callback
