"""Driver query/oracle registry package (split from the former 13k-line
__spark_entry__.py; VERDICT r04 item 10). Modules layer one flat namespace
in import order — core fixtures/helpers, query-body families, oracle
builders, flagship entry + registries — and the final namespace is then
back-propagated into every module so call-time lookups behave exactly as
in the original single module (a query body may call an oracle helper
defined in a later module, as the single file allowed). Memoizing `global`
writes (_TIN_BRUTE_SQL, _HACH_EXPECTED) are read only within their own
modules, so per-module dicts diverging on those after the copy is benign.
"""

from whitebox_tools_spark.queries import (  # noqa: F401  (import order matters)
    core,
    raster_stats,
    solvers,
    vector_lidar,
    oracles,
    flagship,
)

_final = {k: v for k, v in vars(flagship).items() if not k.startswith("__")}
for _m in (core, raster_stats, solvers, vector_lidar, oracles):
    vars(_m).update(
        {k: v for k, v in _final.items() if not k.startswith("__")}
    )
globals().update(_final)
del _final, _m
