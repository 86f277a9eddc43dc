"""HTTP client for a running railgun_spark server — twin of the
reference's `railgun client` command set (railgun/cli/client.go:317-559):
`authenticate`, then per-type add/get/update/delete/list plus exec for
services/jobs/workflows. Pure stdlib (urllib) so a remote catalog can be
driven from any box with Python; the CLI glue lives in cli.py.

Differences by design: item payloads arrive as one JSON object (the
reference synthesizes per-field cobra flags via reflection,
client.go:561-589); the wire surface — paths, methods, bearer header,
`.{ext}` content negotiation — matches the server routes 1:1.
"""

from __future__ import annotations

import json
import urllib.error
import urllib.request

# collections with full CRUD on the server (server.py `_PLURAL_TO_KIND`)
COLLECTIONS = (
    "workspaces",
    "datastores",
    "layers",
    "processes",
    "services",
    "jobs",
    "workflows",
)
# collections whose members can be executed server-side
EXECUTABLE = ("services", "jobs", "workflows")


class ClientError(RuntimeError):
    """Non-2xx response: carries the HTTP status and the response body."""

    def __init__(self, status: int, body: str):
        super().__init__(f"HTTP {status}: {body[:500]}")
        self.status = status
        self.body = body


class RailgunClient:
    def __init__(
        self,
        server: str = "http://localhost:8080",
        token: str | None = None,
        ext: str = "json",
        timeout: float = 30.0,
    ):
        self.server = server.rstrip("/")
        self.token = token
        self.ext = ext
        self.timeout = timeout

    def _request(self, method: str, path: str, payload: dict | None = None) -> str:
        url = f"{self.server}{path}"
        data = None
        headers = {"Accept": "application/json"}
        if payload is not None:
            data = json.dumps(payload).encode()
            headers["Content-Type"] = "application/json"
        if self.token:
            headers["Authorization"] = f"Bearer {self.token}"
        req = urllib.request.Request(url, data=data, headers=headers, method=method)
        try:
            with urllib.request.urlopen(req, timeout=self.timeout) as resp:
                return resp.read().decode()
        except urllib.error.HTTPError as e:
            raise ClientError(e.code, e.read().decode(errors="replace")) from e

    def authenticate(self, username: str, password: str) -> str:
        """POST /authenticate, remember and return the bearer token."""
        body = self._request(
            "POST",
            f"/authenticate.{self.ext}",
            {"username": username, "password": password},
        )
        self.token = json.loads(body)["token"]
        return body

    def list(self, plural: str) -> str:
        return self._request("GET", f"/{plural}.{self.ext}")

    def get(self, plural: str, name: str) -> str:
        return self._request("GET", f"/{plural}/{name}.{self.ext}")

    def add(self, plural: str, obj: dict) -> str:
        return self._request("POST", f"/{plural}.{self.ext}", obj)

    def update(self, plural: str, name: str, obj: dict) -> str:
        return self._request("POST", f"/{plural}/{name}.{self.ext}", obj)

    def delete(self, plural: str, name: str) -> str:
        return self._request("DELETE", f"/{plural}/{name}.{self.ext}")

    def exec(self, plural: str, name: str, variables: dict | None = None) -> str:
        if plural not in EXECUTABLE:
            raise ValueError(f"{plural} cannot be executed (only {EXECUTABLE})")
        payload = {"variables": variables} if variables else {}
        return self._request("POST", f"/{plural}/{name}/exec.{self.ext}", payload)
