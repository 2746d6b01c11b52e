from meshopticalflow_tpu.solvers.cg import pcg, pcg_multi
