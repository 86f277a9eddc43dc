"""Catalog: named datasets, stored queries, parameterized invocations and
sequential workflows — the railgun serve object model (SURVEY §1.1)."""

from railgun_spark.catalog.models import (  # noqa: F401
    DataStore,
    Job,
    Layer,
    Process,
    Service,
    Workflow,
    Workspace,
)
from railgun_spark.catalog.registry import Catalog  # noqa: F401
