"""Scene state and field generation."""

from synthpy_tpu.fields.domain import (  # noqa: F401
    ChannelLayout,
    ScalarDomain,
    TracePack,
    build_pack,
    layout_of,
    peak_ne_over_nc,
)
from synthpy_tpu.fields import grf, spectrum  # noqa: F401
