from meshopticalflow_tpu.ops.ell import HostEll, ell_from_scipy, ell_matvec, coo_slot_map
from meshopticalflow_tpu.ops.elements import (
    scalar_mass_elements,
    scalar_stiffness_elements,
    hat_gradients,
)
from meshopticalflow_tpu.ops.assemble import (
    scalar_mass_csr,
    scalar_stiffness_csr,
    vector_field_mass_blocks,
)
from meshopticalflow_tpu.ops.dataterm import data_term_blocks
