"""Worker-side thread hygiene.

Arrow compute kernels (sort_indices, take, filter, dictionary_encode)
use pyarrow's internal thread pool, whose default size is the machine's
hardware concurrency.  Inside a Ray worker that is catastrophic: N
concurrent map tasks x N arrow threads oversubscribes the node N-fold
and produces NEGATIVE scaling (measured: the per-batch LWW combiner ran
14x slower under 32 concurrent tasks than standalone).  Ray already pins
OMP_NUM_THREADS=1 for numpy/BLAS; this does the same for Arrow.

Call ``single_threaded_kernels()`` at the top of every hot stage's
``__init__``/body — idempotent, ~free after the first call.
"""

from __future__ import annotations

_done = False


def single_threaded_kernels() -> None:
    global _done
    if _done:
        return
    import pyarrow as pa

    pa.set_cpu_count(1)
    pa.set_io_thread_count(1)
    _done = True
