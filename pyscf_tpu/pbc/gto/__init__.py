from .cell import Cell, M
