"""Algebraic diagrammatic construction (reference analog: pyscf/adc)."""
from .radc import RADC, RADCIP, RADCEA


def ADC(mf, frozen=None, method='adc(2)'):
    return RADC(mf, frozen=frozen, method=method)


__all__ = ['ADC', 'RADC', 'RADCIP', 'RADCEA']
from .radc_ee import ADC2EE
