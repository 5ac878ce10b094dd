from .fft import FFTDF
