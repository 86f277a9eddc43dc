"""Catalog object model — field-for-field twins of the reference's core
types (rest-tag fields of railgun/core/*.go):

  Workspace  core/Workspace.go:15-19   {name, title, description}
  DataStore  core/DataStore.go:15-24   {workspace, name, title, description,
                                        uri (DFL expr over variables!),
                                        format, compression, extent}
  Layer      core/Layer.go:16-26       {datastore, name, ..., expression,
                                        defaults, extent}
  Process    core/Process.go:15-21     {name, title, description,
                                        expression, tags}
  Service    core/Service.go:15-24     {name, datastore, process, defaults,
                                        tags}
  Job        core/Job.go:15-22         {name, service, variables, output}
  Workflow   core/Workflow.go:15-21    {name, variables, jobs (ordered)}
"""

from __future__ import annotations

from dataclasses import asdict, dataclass, field


@dataclass
class Workspace:
    name: str
    title: str = ""
    description: str = ""


@dataclass
class DataStore:
    name: str
    workspace: str = ""
    title: str = ""
    description: str = ""
    uri: str = ""  # may be a DFL expression over $variables (core/DataStore.go:19)
    format: str | None = None
    compression: str | None = None
    extent: list[float] | None = None  # [w, s, e, n]


@dataclass
class Layer:
    name: str
    datastore: str = ""
    title: str = ""
    description: str = ""
    expression: str | None = None  # layer-level DFL filter
    defaults: dict = field(default_factory=dict)
    extent: list[float] | None = None


@dataclass
class Process:
    name: str
    title: str = ""
    description: str = ""
    expression: str = "@"
    tags: list[str] = field(default_factory=list)


@dataclass
class Service:
    name: str
    datastore: str = ""
    process: str = ""
    defaults: dict = field(default_factory=dict)
    tags: list[str] = field(default_factory=list)


@dataclass
class Job:
    name: str
    service: str = ""
    variables: dict = field(default_factory=dict)
    output: str | None = None  # output DataStore name


@dataclass
class Workflow:
    name: str
    title: str = ""
    variables: dict = field(default_factory=dict)
    jobs: list[str] = field(default_factory=list)


MODEL_TYPES = {
    "Workspace": Workspace,
    "DataStore": DataStore,
    "Layer": Layer,
    "Process": Process,
    "Service": Service,
    "Job": Job,
    "Workflow": Workflow,
}


def to_dict(obj) -> dict:
    return asdict(obj)
