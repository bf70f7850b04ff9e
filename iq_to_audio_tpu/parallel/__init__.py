"""Multi-chip execution: device meshes and the sharded pipeline step.

The single-capture workload is sequence-parallel by nature: FFT frames of
the overlap-save filter are independent given an (L-1)-sample halo, and the
per-sample recurrences are first-order linear scans that compose across
shards.  The mesh is ``("dp", "seq")``:

* ``dp``  — data parallel over batched channels (or captures),
* ``seq`` — sequence parallel within one chunk: frames are sharded, the FIR
  halo travels by ``lax.ppermute`` over ICI, the demod scans run locally and
  are stitched with an all-gathered carry prefix (a distributed Blelloch
  step), and the tiny audio-rate tail work is replicated.
"""

from .mesh import make_mesh
from .sharded import build_sharded_step, distributed_first_order_scan

__all__ = ["make_mesh", "build_sharded_step", "distributed_first_order_scan"]
