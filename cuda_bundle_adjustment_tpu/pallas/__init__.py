"""Pallas TPU kernels for the hot irregular-access paths.

XLA's general gather/scatter lowering on TPU costs ~30-115 ns per ROW
regardless of width, and any array with a small trailing dimension pays an
(8, 128) tile-padding tax of up to 7-200x in HBM.  These kernels sidestep
both: data lives transposed ``[K, N]`` (components in sublanes, elements in
lanes), windows of the source tables are DMA'd contiguously, and the
"gather" itself is an exact one-hot selection on the MXU built in VMEM
(never materialised to HBM).
"""

from .onehot import build_expand_plan, expand
