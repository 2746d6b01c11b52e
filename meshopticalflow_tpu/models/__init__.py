from meshopticalflow_tpu.models.base import (
    BasisDevice,
    build_basis,
    prolong,
    restrict,
    reduce_rhs,
    data_term_ell_vals,
    update_optical_flow,
)
from meshopticalflow_tpu.models.whitney import build_whitney_basis
from meshopticalflow_tpu.models.conformal import build_conformal_basis
from meshopticalflow_tpu.models.connection import build_connection_basis
