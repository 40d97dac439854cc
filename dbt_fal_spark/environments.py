"""Per-model environment isolation (reference: A/src/fal/dbt/packages/
environments/base.py:104-232 BaseEnvironment/setup-teardown protocol,
virtual_env.py:26-92 venv creation + requirements install).

The reference ran fal scripts in named virtual environments so that
models with conflicting Python dependencies (Prophet vs torch pins)
could coexist in one project. On Spark the heavy compute runs on
executors, so isolation here is DRIVER-side and deliberately narrow:
an isolated script executes in the environment's own interpreter as a
subprocess, receives the script ``context`` (model metadata, arguments,
target) over a JSON handoff, and exchanges data with the pipeline
through files — it does NOT get a live SparkSession (a JVM handle
cannot cross an interpreter boundary; the reference had the same
restriction for its cloud/isolated backends and re-created connections
inside the environment).

Environments are declared in ``fal_project.yml`` (the reference's file):

    environments:
      - name: clean
        type: venv
        requirements:
          - prophet==1.1

and attached per model via ``meta.fal.environment: clean``.
"""

from __future__ import annotations

import hashlib
import json
import subprocess
import sys
import tempfile
import venv
from dataclasses import dataclass, field
from pathlib import Path

import yaml


@dataclass
class VirtualEnvironment:
    """A named venv keyed by its requirement set; created lazily, reused
    across runs (same requirements → same directory, like the reference's
    cache key — virtual_env.py:26-40)."""

    name: str
    requirements: list[str] = field(default_factory=list)
    base_dir: Path = Path(".fal_envs")

    @property
    def env_dir(self) -> Path:
        key = hashlib.md5("\n".join(sorted(self.requirements)).encode()).hexdigest()[:12]
        return self.base_dir / f"{self.name}-{key}"

    @property
    def python(self) -> Path:
        return self.env_dir / "bin" / "python"

    def ensure(self) -> Path:
        """Create the venv (and install requirements) if absent; returns
        the interpreter path. system-site-packages keeps the base stack
        (pandas/pyarrow) visible — requirements only ADD or PIN on top,
        matching how the reference seeded environments."""
        if self.python.exists():
            return self.python
        self.env_dir.parent.mkdir(parents=True, exist_ok=True)
        venv.create(
            self.env_dir,
            with_pip=bool(self.requirements),
            system_site_packages=True,
        )
        if self.requirements:
            proc = subprocess.run(
                [str(self.python), "-m", "pip", "install", "--quiet", *self.requirements],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"environment {self.name!r}: pip install failed "
                    f"(offline container or bad pin?):\n{proc.stderr[-2000:]}"
                )
        return self.python

    def run_script(self, script_path: Path, payload: dict) -> dict:
        """Execute a fal script inside this environment. The child gets a
        ``context`` shim (current_model dict, arguments, target) and
        ``__file__``; status and any ``context['result']`` come back as
        JSON."""
        python = self.ensure()
        runner = (
            "import json, sys\n"
            "payload = json.load(open(sys.argv[1]))\n"
            "class _Ctx:\n"
            "    pass\n"
            "context = _Ctx()\n"
            "context.current_model = payload['current_model']\n"
            "context.arguments = payload['arguments']\n"
            "context.target = payload['target']\n"
            "context.result = None\n"
            "ns = {'context': context, '__file__': payload['script']}\n"
            "code = open(payload['script']).read()\n"
            "exec(compile(code, payload['script'], 'exec'), ns)\n"
            "json.dump({'status': 'success', 'result': context.result,\n"
            "           'python': sys.executable}, open(sys.argv[2], 'w'))\n"
        )
        with tempfile.TemporaryDirectory() as td:
            pf, rf, runf = Path(td, "payload.json"), Path(td, "result.json"), Path(td, "runner.py")
            pf.write_text(json.dumps({**payload, "script": str(script_path)}))
            runf.write_text(runner)
            proc = subprocess.run(
                [str(python), str(runf), str(pf), str(rf)],
                capture_output=True,
                text=True,
            )
            if proc.returncode != 0:
                raise RuntimeError(
                    f"isolated script {script_path} failed in environment "
                    f"{self.name!r}:\n{proc.stderr[-2000:]}"
                )
            if not rf.exists():
                # A script that calls sys.exit(0)/os._exit(0) skips the
                # runner's handoff dump; surface that instead of a bare
                # FileNotFoundError.
                raise RuntimeError(
                    f"isolated script {script_path} exited 0 in environment "
                    f"{self.name!r} without producing a result (did it call "
                    f"sys.exit()?)\nstdout: {proc.stdout[-1000:]}\n"
                    f"stderr: {proc.stderr[-1000:]}"
                )
            return json.loads(rf.read_text())


def load_environments(project_dir: str | Path) -> dict[str, VirtualEnvironment]:
    """Parse fal_project.yml's ``environments:`` list → name → env. An
    absent file (the common case) yields no environments; every script
    then runs in-process exactly as before."""
    path = Path(project_dir) / "fal_project.yml"
    if not path.exists():
        return {}
    doc = yaml.safe_load(path.read_text()) or {}
    out: dict[str, VirtualEnvironment] = {}
    for env in doc.get("environments", []):
        etype = env.get("type", "venv")
        if etype != "venv":
            raise ValueError(
                f"environment {env.get('name')!r}: type {etype!r} not supported "
                "(only 'venv'; the reference's conda/cloud backends are out of "
                "scope — SURVEY §2 D8-D10)"
            )
        out[env["name"]] = VirtualEnvironment(
            name=env["name"],
            requirements=list(env.get("requirements", [])),
            base_dir=Path(project_dir) / ".fal_envs",
        )
    return out


def current_interpreter() -> str:
    return sys.executable
