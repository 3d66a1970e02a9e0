"""Post-processing and image analysis."""

from synthpy_tpu.analysis.imaging import (  # noqa: F401
    Image,
    register,
    register_translation,
)
from synthpy_tpu.analysis.fringes import (  # noqa: F401
    carrier_frequency,
    extract_phase,
    phase_difference,
)
from synthpy_tpu.analysis.abel import (  # noqa: F401
    abel_forward,
    abel_invert,
    invert_phase_map,
    phase_to_line_density,
)
from synthpy_tpu.analysis import memprof  # noqa: F401
