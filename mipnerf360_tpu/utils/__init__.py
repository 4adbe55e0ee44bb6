from .logging import MetricsLogger, Timer
