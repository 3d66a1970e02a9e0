"""File interchange: VTK ImageData, ray dumps, FLASH HDF5, EoS tables."""

from synthpy_tpu.io import vti  # noqa: F401
from synthpy_tpu.io.eos import read_propaceos  # noqa: F401
from synthpy_tpu.io.flash import hdf_readin, hdf_to_pvti  # noqa: F401
from synthpy_tpu.io.integral_quantities import (  # noqa: F401
    read_integral_quantities,
)
from synthpy_tpu.io.rays import (  # noqa: F401
    load_histograms,
    load_pickle,
    load_rays,
    save_histograms,
    save_pickle,
    save_rays,
)
from synthpy_tpu.io.vti import (  # noqa: F401
    export_pvti,
    export_scalar_field,
    pvti_readin,
    read_pvti,
    read_vti,
    write_pvti,
    write_vti,
)
