"""Leveled logger with CPU/wall timers (analog of reference
pyscf/lib/logger.py: Logger:195, timer:167)."""
import sys
import time

QUIET = 0
CRIT = 1
ERROR = 2
WARN = 3
NOTE = 4
INFO = 5
DEBUG = 6
DEBUG1 = 7
DEBUG2 = 8

TIMER_LEVEL = INFO


def process_clock():
    return time.process_time()


def perf_counter():
    return time.perf_counter()


class Logger:
    def __init__(self, stdout=None, verbose=NOTE):
        self.stdout = stdout or sys.stdout
        self.verbose = verbose
        self._t0 = (process_clock(), perf_counter())

    def _log(self, level, msg, *args):
        if self.verbose >= level:
            print(msg % args if args else msg, file=self.stdout, flush=True)

    def error(self, msg, *args):
        self._log(ERROR, 'Error: ' + msg, *args)

    def warn(self, msg, *args):
        self._log(WARN, 'Warn: ' + msg, *args)

    def note(self, msg, *args):
        self._log(NOTE, msg, *args)

    def info(self, msg, *args):
        self._log(INFO, msg, *args)

    def debug(self, msg, *args):
        self._log(DEBUG, msg, *args)

    def debug1(self, msg, *args):
        self._log(DEBUG1, msg, *args)

    def timer(self, msg, cpu0=None, wall0=None):
        cpu1, wall1 = process_clock(), perf_counter()
        if cpu0 is None:
            cpu0, wall0 = self._t0
        self._t0 = (cpu1, wall1)
        if self.verbose >= TIMER_LEVEL:
            self._log(TIMER_LEVEL, '    CPU time for %s %9.2f sec, '
                      'wall time %9.2f sec', msg, cpu1 - cpu0, wall1 - wall0)
        return cpu1, wall1


def new_logger(obj=None, verbose=None):
    if verbose is None:
        verbose = getattr(obj, 'verbose', NOTE)
    return Logger(verbose=verbose)
