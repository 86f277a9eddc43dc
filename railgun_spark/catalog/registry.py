"""Catalog registry: CRUD with conflict/dependency checks, JSON/YAML
persistence, and execution semantics.

Reference parity:
- add/get/update/delete with ErrAlreadyExists on name conflicts
  (railgun/catalog/Catalog.go:62-84) and dependency-checked deletes
  (railgun/catalog/RailgunCatalog.go:405-501)
- LoadFromUri/SaveToUri for the whole catalog in any document format
  (railgun/catalog/RailgunCatalog.go:531-729, :967)
- service exec variable merge: session cache -> service defaults ->
  request variables (railgun/handlers/ServiceExecHandler.go:96-130);
  returned assignments are cached per service for session continuity
  (ServiceExecHandler.go:282-290)
- datastore uri is itself a DFL expression evaluated against variables
  (ServiceExecHandler.go:132)
- workflow exec runs jobs sequentially, sharing variables
  (railgun/handlers/WorkflowExecHandler.go:79-186)
- TTL'd dataframe cache keyed by source mtime
  (railgun/cache/Cache.go:25-79, ServiceExecHandler.go:159-278)
"""

from __future__ import annotations

import json
import os
import threading as _threading
import time
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from railgun_spark.catalog.models import (
    MODEL_TYPES,
    DataStore,
    Job,
    Layer,
    Process,
    Service,
    Workflow,
    Workspace,
    to_dict,
)
from railgun_spark.dfl import run_pipeline
from railgun_spark.dfl import parser as _dfl_parser
from railgun_spark.dfl.ast import Literal
from railgun_spark.dfl.compiler import Context, compile_expr
from railgun_spark.sources import formats


class AlreadyExists(ValueError):
    pass


class NotFound(KeyError):
    pass


class DependencyError(ValueError):
    pass


_PLURAL = {
    Workspace: "workspaces",
    DataStore: "datastores",
    Layer: "layers",
    Process: "processes",
    Service: "services",
    Job: "jobs",
    Workflow: "workflows",
}


@dataclass
class _CacheEntry:
    df: DataFrame
    mtime: float
    loaded_at: float


@dataclass
class Catalog:
    spark: SparkSession
    ttl_seconds: float = 300.0  # layer/service cache TTL (cache/Cache.go:79)
    objects: dict[str, dict[str, object]] = field(
        default_factory=lambda: {p: {} for p in _PLURAL.values()}
    )
    _df_cache: dict[str, _CacheEntry] = field(default_factory=dict)
    _service_vars: dict[str, dict] = field(default_factory=dict)
    # (layer, z, x, y, mask_zoom, threshold) -> (source mtime, loaded_at,
    # grid): the reference caches layer results with the same 5-min TTL
    # (cache/Cache.go:79); here the cached unit is the DRIVER-TINY mask
    # grid (<= 2^8 x 2^8 ints), not the frame, because the groupBy grid is
    # where the serve wall goes (SERVE_CONC_SF1_r15: ~1.1-1.3 s / request)
    _grid_cache: dict[tuple, tuple] = field(default_factory=dict)
    _grid_cache_max: int = 1024
    _grid_cache_lock: object = field(default_factory=_threading.Lock)
    # data-tile feature lists (layer_tile_features) — same TTL/mtime/
    # generation discipline as the mask grids, separate dict with a
    # smaller cap because a cached unit is up to `limit` GeoJSON
    # features, not a 2^8 x 2^8 int grid
    _tile_cache: dict[tuple, tuple] = field(default_factory=dict)
    _tile_cache_max: int = 256
    # bumped (under the lock) by every update/delete invalidation: a grid
    # computed OUTSIDE the lock is inserted only if the generation it
    # started under is still current, so an invalidation landing
    # mid-compute discards the stale grid instead of caching it for TTL
    _grid_cache_gen: int = 0

    # ---- CRUD (GroupHandler/ItemHandler semantics) ----
    def add(self, obj) -> None:
        bucket = self.objects[_PLURAL[type(obj)]]
        if obj.name in bucket:
            raise AlreadyExists(f"{type(obj).__name__} {obj.name!r} already exists")
        bucket[obj.name] = obj

    def get(self, kind: type, name: str):
        bucket = self.objects[_PLURAL[kind]]
        if name not in bucket:
            raise NotFound(f"{kind.__name__} {name!r}")
        return bucket[name]

    def update(self, obj) -> None:
        bucket = self.objects[_PLURAL[type(obj)]]
        if obj.name not in bucket:
            raise NotFound(f"{type(obj).__name__} {obj.name!r}")
        bucket[obj.name] = obj
        if isinstance(obj, (Layer, DataStore)):
            # a redefined layer expression / datastore uri invalidates any
            # cached mask grids / tile features computed under the old
            # definition (both caches are driver-bounded; selective purge
            # isn't worth it)
            with self._grid_cache_lock:
                self._grid_cache_gen += 1
                self._grid_cache.clear()
                self._tile_cache.clear()

    def list(self, kind: type) -> list:
        return sorted(self.objects[_PLURAL[kind]].values(), key=lambda o: o.name)

    def delete(self, kind: type, name: str) -> None:
        """Dependency-checked delete (RailgunCatalog.go:405-501)."""
        self.get(kind, name)
        deps = self._dependents(kind, name)
        if deps:
            raise DependencyError(f"{kind.__name__} {name!r} is used by {deps}")
        del self.objects[_PLURAL[kind]][name]
        if kind in (Layer, DataStore):
            # delete-then-re-add under the same name must not serve grids
            # computed under the deleted definition (same rule as update)
            with self._grid_cache_lock:
                self._grid_cache_gen += 1
                self._grid_cache.clear()
                self._tile_cache.clear()

    def _dependents(self, kind: type, name: str) -> list[str]:
        deps: list[str] = []
        if kind is DataStore:
            deps += [l.name for l in self.list(Layer) if l.datastore == name]
            deps += [s.name for s in self.list(Service) if s.datastore == name]
            deps += [j.name for j in self.list(Job) if j.output == name]
        if kind is Process:
            deps += [s.name for s in self.list(Service) if s.process == name]
        if kind is Service:
            deps += [j.name for j in self.list(Job) if j.service == name]
        if kind is Job:
            deps += [w.name for w in self.list(Workflow) if name in w.jobs]
        if kind is Workspace:
            deps += [d.name for d in self.list(DataStore) if d.workspace == name]
        return deps

    # ---- persistence (LoadFromUri/SaveToUri parity) ----
    def save(self, path: str) -> None:
        # MODEL_TYPES keys verbatim ('DataStore', not 'Datastore') — load()
        # reads the same keys, so every type round-trips.
        doc = {key: [to_dict(o) for o in self.list(kind)] for key, kind in MODEL_TYPES.items()}
        with open(path, "w") as f:
            if path.endswith((".yaml", ".yml")):
                import yaml

                yaml.safe_dump(doc, f)
            else:
                json.dump(doc, f, indent=2)

    @classmethod
    def load(cls, spark: SparkSession, path: str) -> "Catalog":
        with open(path) as f:
            if path.endswith((".yaml", ".yml")):
                import yaml

                doc = yaml.safe_load(f)
            else:
                doc = json.load(f)
        cat = cls(spark)
        for key, kind in MODEL_TYPES.items():
            for item in doc.get(key, []) or []:
                cat.add(kind(**item))
        return cat

    # ---- execution ----
    def _resolve_uri(self, uri: str, variables: dict) -> str:
        """DataStore uris are DFL expressions over $variables
        (core/DataStore.go:19, hostosm.sh:20)."""
        try:
            node = _dfl_parser.parse(uri)
        except Exception:
            return uri
        if isinstance(node, Literal):
            return str(node.value)
        ctx = Context(df=None, variables=dict(variables))
        # static evaluation: string concat of literals/variables
        from railgun_spark.dfl.ast import Binary, Variable

        def ev(n) -> str:
            if isinstance(n, Literal):
                return str(n.value)
            if isinstance(n, Variable):
                return str(variables[n.name])
            if isinstance(n, Binary) and n.op == "+":
                return ev(n.left) + ev(n.right)
            raise ValueError(f"unsupported uri expression node {n}")

        return ev(node)

    # stored SQL queries addressable as `stored_query://<name>` datastore
    # uris — the Spark-native twin of the reference's `athena://` stored-
    # query source (railgun/cli/process.go:423-517,
    # railgun/athenaiterator/AthenaIterator.go:22-78): where railgun pages
    # Athena results of a saved query, we run the saved SQL on the session
    # catalog and get a distributed DataFrame directly.
    stored_queries: dict[str, str] = field(default_factory=dict)

    def add_stored_query(self, name: str, sql: str) -> None:
        if name in self.stored_queries:
            raise AlreadyExists(f"stored query {name!r} already exists")
        self.stored_queries[name] = sql

    def load_datastore(self, name: str, variables: dict | None = None) -> DataFrame:
        """mtime-keyed TTL cache around the datastore read
        (ServiceExecHandler.go:159-278)."""
        ds: DataStore = self.get(DataStore, name)
        uri = self._resolve_uri(ds.uri, variables or {})
        if uri.startswith("stored_query://"):
            qname = uri[len("stored_query://") :]
            if qname not in self.stored_queries:
                raise NotFound(f"stored query {qname!r}")
            return self.spark.sql(self.stored_queries[qname])
        if uri.startswith("jdbc:"):
            # external-warehouse passthrough (athena/postgres/...): pushdown
            # + partitioned range reads via the vendor driver (sources/jdbc.py)
            from railgun_spark.sources.jdbc import read_jdbc

            return read_jdbc(self.spark, uri)
        mtime = os.path.getmtime(uri) if os.path.exists(uri) else -1.0
        now = time.time()
        ent = self._df_cache.get(uri)
        if ent and ent.mtime == mtime and now - ent.loaded_at < self.ttl_seconds:
            return ent.df
        if ent is not None:
            # expired or stale: release executor memory before re-caching
            ent.df.unpersist()
        df = formats.read(self.spark, uri, fmt=ds.format)
        df = df.cache()
        self._df_cache[uri] = _CacheEntry(df=df, mtime=mtime, loaded_at=now)
        return df

    def layer_frame(self, name: str, variables: dict | None = None) -> DataFrame:
        layer: Layer = self.get(Layer, name)
        merged = {**layer.defaults, **(variables or {})}
        df = self.load_datastore(layer.datastore, merged)
        if layer.expression:
            df = run_pipeline(df, layer.expression, merged)
        return df

    def layer_mask_grid(
        self, name: str, z: int, x: int, y: int,
        mask_zoom: int, threshold: int,
    ) -> list:
        """TTL + source-mtime cached mask grid for the tile mask route —
        the reference's layer-cache behavior (cache/Cache.go:79, 5-min
        TTL) applied at the grid level: a warm repeat skips the whole
        groupBy, a datastore rewrite (mtime change), layer/datastore
        update, or TTL expiry recomputes. stored_query:// and jdbc:
        sources have no mtime and fall back to TTL-only, exactly the
        reference's behavior."""
        layer: Layer = self.get(Layer, name)
        ds: DataStore = self.get(DataStore, layer.datastore)
        uri = self._resolve_uri(ds.uri, layer.defaults or {})
        mtime = os.path.getmtime(uri) if os.path.exists(uri) else -1.0
        key = (name, z, x, y, mask_zoom, threshold)
        now = time.time()
        with self._grid_cache_lock:
            ent = self._grid_cache.get(key)
            gen = self._grid_cache_gen
        if ent and ent[0] == mtime and now - ent[1] < self.ttl_seconds:
            return ent[2]
        from railgun_spark.geo.serving import tile_mask_grid

        grid = tile_mask_grid(
            self.layer_frame(name), z, x, y,
            mask_zoom=mask_zoom, threshold=threshold,
            layer_extent=tuple(layer.extent) if layer.extent else None,
        )
        with self._grid_cache_lock:
            # bounded: drop the oldest insertion (dict order) so a tile
            # crawler can't grow driver memory without bound. Locked:
            # the serve path is threaded and two concurrent evictions
            # could otherwise race iter() against a resize. Generation
            # check: a layer/datastore update that landed while this
            # grid was computing bumped the generation, so the grid was
            # built under a stale definition — return it to this caller
            # (it read a consistent snapshot) but never cache it.
            if gen == self._grid_cache_gen:
                if len(self._grid_cache) >= self._grid_cache_max:
                    self._grid_cache.pop(next(iter(self._grid_cache)), None)
                self._grid_cache[key] = (mtime, now, grid)
        return grid

    def layer_tile_features(
        self, name: str, z: int, x: int, y: int,
        limit: int | None = None, user_dfl: str | None = None,
        buffer_tiles: int = 1,
    ) -> list:
        """TTL + source-mtime cached data-tile features — the reference
        caches layer DATA with the same 5-min TTL (cache/Cache.go:25-79)
        that layer_mask_grid applies to mask grids; without it the data
        route recomputed the bbox filter + collect per request (warm
        tiles_data p50 0.38-0.43 s at 12-wide sf1, SERVE_CONC_SF1_r16,
        vs the mask's 31-36 ms). The cached unit is the driver-resident
        GeoJSON feature list (bounded by `limit`); invalidation is
        layer_mask_grid's exactly: datastore rewrite (mtime), layer/
        datastore update or delete (generation counter discards grids
        AND mid-compute results), TTL expiry."""
        layer: Layer = self.get(Layer, name)
        ds: DataStore = self.get(DataStore, layer.datastore)
        uri = self._resolve_uri(ds.uri, layer.defaults or {})
        mtime = os.path.getmtime(uri) if os.path.exists(uri) else -1.0
        key = (name, z, x, y, limit, user_dfl, buffer_tiles)
        now = time.time()
        with self._grid_cache_lock:
            ent = self._tile_cache.get(key)
            gen = self._grid_cache_gen
        if ent and ent[0] == mtime and now - ent[1] < self.ttl_seconds:
            return ent[2]
        from railgun_spark.geo.serving import tile_data

        feats = tile_data(
            self.layer_frame(name), z, x, y,
            layer_extent=tuple(layer.extent) if layer.extent else None,
            user_dfl=user_dfl, limit=limit, buffer_tiles=buffer_tiles,
        )
        with self._grid_cache_lock:
            if gen == self._grid_cache_gen:
                if len(self._tile_cache) >= self._tile_cache_max:
                    self._tile_cache.pop(next(iter(self._tile_cache)), None)
                self._tile_cache[key] = (mtime, now, feats)
        return feats

    def exec_service(self, name: str, variables: dict | None = None):
        """cache -> defaults -> request variable merge
        (ServiceExecHandler.go:96-130)."""
        svc: Service = self.get(Service, name)
        proc: Process = self.get(Process, svc.process)
        merged = {
            **self._service_vars.get(name, {}),
            **svc.defaults,
            **(variables or {}),
        }
        df = self.load_datastore(svc.datastore, merged)
        result, final_vars = run_pipeline(df, proc.expression, merged, return_vars=True)
        # session continuity (ServiceExecHandler.go:282-290): cache scalar
        # bindings the DFL evaluation produced or REBOUND — but never the
        # caller's request variables passing through unchanged, which must
        # not leak into later requests.
        from pyspark.sql import Column

        def _evaluation_bound(k, v) -> bool:
            if isinstance(v, (DataFrame, Column)):
                return False
            if k not in merged:
                return True
            try:
                return bool(v != merged[k])
            except (TypeError, ValueError):  # incomparable (e.g. ndarray): rebound object
                return v is not merged[k]

        self._service_vars.setdefault(name, {}).update(
            {k: v for k, v in final_vars.items() if _evaluation_bound(k, v)}
        )
        return result

    def exec_job(self, name: str, extra_variables: dict | None = None):
        job: Job = self.get(Job, name)
        variables = {**job.variables, **(extra_variables or {})}
        result = self.exec_service(job.service, variables)
        if job.output is not None and isinstance(result, DataFrame):
            out: DataStore = self.get(DataStore, job.output)
            uri = self._resolve_uri(out.uri, variables)
            formats.write(result, uri, fmt=out.format)
        return result

    def exec_workflow(self, name: str) -> list:
        """Sequential job execution with shared variables
        (WorkflowExecHandler.go:79-186)."""
        wf: Workflow = self.get(Workflow, name)
        results = []
        for job_name in wf.jobs:
            results.append(self.exec_job(job_name, wf.variables))
        return results
