"""HTTP catalog + query server — `railgun serve` twin on Flask.

Route parity with railgun/router/RailgunRouter.go:
  GET/POST   /{plural}.{ext}                 list / add        (:109-115)
  GET/POST/DELETE /{plural}/{name}.{ext}     get / update / delete (:117-125)
  POST       /services/{name}/exec.{ext}     stored query exec (:127)
  POST       /jobs/{name}/exec.{ext}         job exec          (:129)
  POST       /workflows/{name}/exec.{ext}    sequential jobs   (:131)
  GET        /layers/{name}/items.{ext}      dfl + limit items (:132, ItemsHandler.go:43-194)
  GET        /layers/{name}/tiles/data/{z}/{x}/{y}.{ext}   (:133)
  GET        /layers/{name}/tiles/mask/{z}/{x}/{y}.png     (:135)
  GET        /dfl/functions.{ext}            function catalog  (:65)
  GET        /gss/formats.{ext}              format list       (:58)

Content negotiation by URL extension (json|yaml), as in
util/SplitNameFormatCompression.go:14-106 / BaseHandler.go:206-228.
JWT auth (BaseHandler.go:61-93) is intentionally not wired in this build.

The server is a driver-side veneer: every request compiles to a DataFrame
plan executed by the shared SparkSession; the catalog's TTL/mtime caches
(registry.py) bound repeated reads exactly like the reference's 5-minute
caches (cache/Cache.go:79)."""

from __future__ import annotations

import json

from railgun_spark.catalog.models import MODEL_TYPES, to_dict
from railgun_spark.catalog.registry import AlreadyExists, Catalog, DependencyError, NotFound
from railgun_spark.functions import functions as dfl_functions
from railgun_spark.sources.formats import FORMATS

_PLURAL_TO_KIND = {
    "workspaces": "Workspace",
    "datastores": "DataStore",
    "layers": "Layer",
    "processes": "Process",
    "services": "Service",
    "jobs": "Job",
    "workflows": "Workflow",
}


def _render(payload, ext: str):
    from flask import Response

    if ext in ("yaml", "yml"):
        import yaml

        return Response(yaml.safe_dump(payload), mimetype="application/yaml")
    return Response(json.dumps(payload, default=str), mimetype="application/json")


def _df_payload(result, limit: int = 1000):
    from pyspark.sql import DataFrame

    if isinstance(result, DataFrame):
        return [r.asDict(recursive=True) for r in result.limit(limit).collect()]
    return result


def create_app(catalog: Catalog):
    from flask import Flask, request

    app = Flask("railgun_spark")

    @app.errorhandler(NotFound)
    def _nf(e):
        return _render({"error": str(e)}, "json"), 404

    @app.errorhandler(AlreadyExists)
    def _ae(e):
        return _render({"error": str(e)}, "json"), 409

    @app.errorhandler(DependencyError)
    def _de(e):
        return _render({"error": str(e)}, "json"), 400

    @app.route("/<plural>.<ext>", methods=["GET", "POST"])
    def group(plural, ext):
        kind_name = _PLURAL_TO_KIND.get(plural)
        if kind_name is None:
            return _render({"error": f"unknown collection {plural}"}, ext), 404
        kind = MODEL_TYPES[kind_name]
        if request.method == "POST":
            catalog.add(kind(**request.get_json(force=True)))
            return _render({"success": True}, ext)
        return _render([to_dict(o) for o in catalog.list(kind)], ext)

    @app.route("/<plural>/<name>.<ext>", methods=["GET", "POST", "DELETE"])
    def item(plural, name, ext):
        kind_name = _PLURAL_TO_KIND.get(plural)
        if kind_name is None:
            return _render({"error": f"unknown collection {plural}"}, ext), 404
        kind = MODEL_TYPES[kind_name]
        if request.method == "DELETE":
            catalog.delete(kind, name)
            return _render({"success": True}, ext)
        if request.method == "POST":
            body = request.get_json(force=True)
            body["name"] = name
            catalog.update(kind(**body))
            return _render({"success": True}, ext)
        return _render(to_dict(catalog.get(kind, name)), ext)

    @app.route("/services/<name>/exec.<ext>", methods=["POST"])
    def service_exec(name, ext):
        body = request.get_json(silent=True) or {}
        result = catalog.exec_service(name, body.get("variables", {}))
        return _render(_df_payload(result), ext)

    @app.route("/jobs/<name>/exec.<ext>", methods=["POST"])
    def job_exec(name, ext):
        result = catalog.exec_job(name)
        return _render(_df_payload(result), ext)

    @app.route("/workflows/<name>/exec.<ext>", methods=["POST"])
    def workflow_exec(name, ext):
        results = catalog.exec_workflow(name)
        return _render([_df_payload(r) for r in results], ext)

    @app.route("/layers/<name>/items.<ext>")
    def layer_items(name, ext):
        from railgun_spark.dfl import run_pipeline

        df = catalog.layer_frame(name)
        user_dfl = request.args.get("dfl")
        if user_dfl:
            df = run_pipeline(df, user_dfl)
        limit = int(request.args.get("limit", 1000))
        return _render(_df_payload(df, limit if limit >= 0 else 1000), ext)

    @app.route("/layers/<name>/tiles/data/<int:z>/<int:x>/<int:y>.<ext>")
    def layer_tile_data(name, z, x, y, ext):
        from railgun_spark.geo.serving import feature_collection, tile_data

        layer = catalog.get(MODEL_TYPES["Layer"], name)
        df = catalog.layer_frame(name)
        feats = tile_data(
            df,
            z,
            x,
            y,
            layer_extent=tuple(layer.extent) if layer.extent else None,
            user_dfl=request.args.get("dfl"),
            limit=int(request.args.get("limit", -1)),
        )
        return _render(feature_collection(feats), ext)

    @app.route("/layers/<name>/tiles/mask/<int:z>/<int:x>/<int:y>.png")
    def layer_tile_mask(name, z, x, y):
        from flask import Response

        from railgun_spark.geo.serving import grid_to_png, tile_mask_grid

        layer = catalog.get(MODEL_TYPES["Layer"], name)
        df = catalog.layer_frame(name)
        zoom = int(request.args.get("zoom", min(z + 4, 18)))
        threshold = int(request.args.get("threshold", 1))
        grid = tile_mask_grid(
            df, z, x, y, mask_zoom=zoom, threshold=threshold,
            layer_extent=tuple(layer.extent) if layer.extent else None,
        )
        return Response(grid_to_png(grid), mimetype="image/png")

    @app.route("/dfl/functions.<ext>")
    def functions_route(ext):
        return _render(dfl_functions(), ext)

    @app.route("/gss/formats.<ext>")
    def formats_route(ext):
        return _render(sorted(FORMATS), ext)

    return app
