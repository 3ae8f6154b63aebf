"""Python UDTF surface (Spark 4): sketch introspection as a table
function — explode an HLL sketch into its nonzero (register, value)
rows for debugging / drift analysis. Inspection path, not the hot path.

    from pfutil_spark.functions.udtf import register_udtfs
    register_udtfs(spark)
    spark.sql("SELECT t.* FROM sketches, LATERAL pf_registers(sketch) t")
"""

from __future__ import annotations

import numpy as np


def register_udtfs(spark) -> None:
    from pyspark.sql.functions import udtf

    from pfutil_spark.kernel import hll

    @udtf(returnType="reg_index int, value int")
    class PfRegisters:
        def eval(self, sketch):  # noqa: D102
            if sketch is None:
                return
            regs = hll.decode(bytes(sketch))
            for i in np.flatnonzero(regs):
                yield int(i), int(regs[i])

    spark.udtf.register("pf_registers", PfRegisters)
