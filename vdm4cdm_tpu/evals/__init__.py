from .spectra import power, pk, get_ccs, pk_conversion
from .pdfs import log_pdf
from .figures import draw_figure, draw_figure_sfm

__all__ = ["power", "pk", "get_ccs", "pk_conversion", "log_pdf",
           "draw_figure", "draw_figure_sfm"]
