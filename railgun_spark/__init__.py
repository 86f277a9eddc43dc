"""railgun_spark — a PySpark-native analytics engine with the query and
data-processing capabilities of spatialcurrent/railgun (reference studied at
/root/reference, v0.0.5, Go, MIT).

This is NOT a port: the reference is a row-at-a-time interpreted evaluator
(reference: railgun/cli/process.go:918); we re-express the same semantics as
Catalyst logical plans via the DataFrame/SQL API so Spark's optimizer and
Tungsten codegen pick the physical strategy.

Layout:
  dfl/        DFL (Dynamic Filter Language) parser + compiler to Columns
  operators/  collection operators (filter/map/hist/group/sort/...), dedup,
              similarity, text analysis, multimodal
  sources/    multi-format multi-scheme readers/writers + dynamic sinks
  functions/  scalar/aggregate function registry (go-adaptive-functions twin)
  geo/        web-mercator tile math as native Column expressions
  plans/      process() pipeline assembly (read -> expr -> write)
  catalog/    Workspace/DataStore/Layer/Process/Service/Job/Workflow registry
  streaming/  structured-streaming superset of the reference's --stream mode
"""

__version__ = "0.1.0"

from railgun_spark.session import get_spark  # noqa: F401
