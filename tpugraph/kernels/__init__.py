from tpugraph.kernels.spmm import spmm, spmm_xla
