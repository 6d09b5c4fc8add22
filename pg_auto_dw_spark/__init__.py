"""pg_auto_dw_spark: a PySpark-native rebuild of tembo-io/pg_auto_dw.

Automates construction + incremental loading of a Data Vault 2.0 raw
vault over Spark tables, re-expressed Spark-first (DataFrame/SQL +
Catalyst), plus the large-scale training-data pipeline operators
(dedup, similarity search, text analysis, multimodal plumbing) that a
100 TB deployment needs.
"""

__version__ = "0.1.0"

import os as _os

# numpy >= 1.18 madvises THP (MADV_HUGEPAGE) on every allocation >= 4 MB.
# Under a kernel with transparent_hugepage/defrag = madvise (this
# sandbox, and many hardened hosts) that madvise triggers SYNCHRONOUS
# compaction on first touch: a fresh Python worker's first large numpy
# array (the Arrow-batch kernels' buffers) measured 6-60 s for a
# 32-200 MB allocation vs ~0.15 s steady state, turning per-task worker
# spawn into a lottery. numpy reads this env var at import, and Python
# workers inherit the driver environment in local mode, so setting it
# here (before any session builds) covers every worker. setdefault, not
# assignment: export NUMPY_MADVISE_HUGEPAGE=1 to restore hugepages on
# hosts whose THP defrag policy makes them a win.
_os.environ.setdefault("NUMPY_MADVISE_HUGEPAGE", "0")
