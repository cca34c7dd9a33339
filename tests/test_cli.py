"""CLI integration: index -> search -> query -> status -> projects ->
metadata through `main()` on the fixture repo, fully offline.

Parity model: reference `main.py` subcommand surface (SURVEY §2 #53).
"""

import json
import shutil

import pytest

from lattice_tpu import main as cli


@pytest.fixture()
def repo(tmp_path, sample_project_path, monkeypatch):
    root = tmp_path / "proj"
    shutil.copytree(sample_project_path, root)
    # isolate the projects registry
    monkeypatch.setattr(cli, "PROJECTS_REGISTRY",
                        tmp_path / "registry.json")
    # isolate settings: force hash provider + small dims via env file
    env = tmp_path / "cli.env"
    env.write_text(
        "EMBEDDING_PROVIDER=hash\nEMBEDDING_DIMENSIONS=128\n"
        "LATTICE_INDEX_DTYPE=float32\n")
    return root, env


def run(args, env):
    return cli.main(["--env", str(env)] + args)


class TestCLIRoundtrip:
    def test_full_flow(self, repo, capsys):
        root, env = repo
        assert run(["index", str(root), "--project", "cli-test"], env) == 0
        out = capsys.readouterr().out
        assert "indexed cli-test" in out

        assert run(["search", "who calls validate_email_format",
                    "--path", str(root), "--json"], env) == 0
        results = json.loads(capsys.readouterr().out)
        names = [r["name"] for r in results]
        assert "app.services.user_service.UserService.create_user" in names

        assert run(["query", "what is the class hierarchy of AdminUser",
                    "--path", str(root)], env) == 0
        out = capsys.readouterr().out
        assert "BaseModel" in out

        assert run(["status", "--path", str(root)], env) == 0
        out = capsys.readouterr().out
        assert "project: cli-test" in out
        assert "graph:" in out

        assert run(["projects", "list"], env) == 0
        out = capsys.readouterr().out
        assert "cli-test" in out

        assert run(["metadata", "show", "--path", str(root),
                    "--project", "cli-test"], env) == 0
        meta = json.loads(capsys.readouterr().out)
        assert meta["status"] in ("completed", "partial")

        assert run(["settings"], env) == 0
        dumped = json.loads(capsys.readouterr().out)
        assert dumped["ai"]["embedding_provider"] == "hash"

        assert run(["projects", "delete", "cli-test"], env) == 0
        assert not (root / ".lattice").exists()

    def test_search_without_index_errors(self, repo, tmp_path, capsys):
        _, env = repo
        empty = tmp_path / "empty"
        empty.mkdir()
        rc = run(["search", "anything", "--path", str(empty)], env)
        assert rc == 1
        err = capsys.readouterr().err
        assert "no index found" in err

    def test_incremental_reindex_skips(self, repo, capsys):
        root, env = repo
        run(["index", str(root), "--project", "cli-test"], env)
        capsys.readouterr()
        assert run(["index", str(root), "--project", "cli-test"], env) == 0
        out = capsys.readouterr().out
        assert "indexed cli-test" in out


class TestPlatformPinning:
    def test_lattice_platform_cpu_pins_jax_preinit(self, tmp_path):
        # LATTICE_PLATFORM=cpu must pin JAX to the host CPU before any
        # device init — otherwise every CLI call pays the accelerator
        # attach handshake. Subprocess so this session's jax config
        # doesn't leak in; 90s timeout treats an attach hang as failure.
        import os
        import subprocess
        import sys
        env_file = tmp_path / "p.env"
        env_file.write_text("LATTICE_PLATFORM=cpu\n")
        env = {k: v for k, v in os.environ.items()
               if not k.startswith(("JAX_", "XLA_"))}
        proc = subprocess.run(
            [sys.executable, "-c",
             "from lattice_tpu.main import main\n"
             f"assert main(['--env', r'{env_file}', 'settings']) == 0\n"
             "import jax\n"
             "assert jax.devices()[0].platform == 'cpu', "
             "jax.devices()[0].platform\n"
             "print('PINNED-CPU')"],
            env=env, capture_output=True, text=True, timeout=90)
        assert proc.returncode == 0, proc.stderr[-2000:]
        assert "PINNED-CPU" in proc.stdout


class TestBatchFileSearch:
    """`search --batch-file` (r4): newline-separated queries ranked
    corpus-wide in one batched execution; '-' reads stdin."""

    def test_batch_file_ranks_each_query(self, repo, tmp_path, capsys):
        root, env = repo
        run(["index", str(root), "--project", "cli-test"], env)
        capsys.readouterr()
        qfile = tmp_path / "queries.txt"
        qfile.write_text("who calls validate_email_format\n\n"
                         "what is AdminUser\n")
        assert run(["search", "--path", str(root), "--json",
                    "--batch-file", str(qfile)], env) == 0
        batch = json.loads(capsys.readouterr().out)
        assert [b["query"] for b in batch] == [
            "who calls validate_email_format", "what is AdminUser"]
        assert all(b["results"] for b in batch)
        assert all("intent" in b for b in batch)

    def test_batch_file_stdin(self, repo, capsys, monkeypatch):
        import io
        root, env = repo
        run(["index", str(root), "--project", "cli-test"], env)
        capsys.readouterr()
        monkeypatch.setattr("sys.stdin", io.StringIO("what is AdminUser\n"))
        assert run(["search", "--path", str(root), "--json",
                    "--batch-file", "-"], env) == 0
        batch = json.loads(capsys.readouterr().out)
        assert len(batch) == 1 and batch[0]["results"]

    def test_batch_file_missing_is_a_clean_error(self, repo, tmp_path,
                                                 capsys):
        root, env = repo
        run(["index", str(root), "--project", "cli-test"], env)
        capsys.readouterr()
        rc = run(["search", "--path", str(root),
                  "--batch-file", str(tmp_path / "nope.txt")], env)
        assert rc == 1
        assert "cannot read batch file" in capsys.readouterr().out

    def test_batch_file_empty_is_a_clean_error(self, repo, tmp_path,
                                               capsys):
        root, env = repo
        run(["index", str(root), "--project", "cli-test"], env)
        capsys.readouterr()
        qfile = tmp_path / "empty.txt"
        qfile.write_text("\n\n")
        rc = run(["search", "--path", str(root),
                  "--batch-file", str(qfile)], env)
        assert rc == 1
        assert "no queries" in capsys.readouterr().out


class TestPersistentCompileCache:
    def test_cli_sets_xla_cache_dir(self, repo, monkeypatch, tmp_path,
                                    capsys):
        """A fresh CLI process must point JAX at a persistent compile
        cache (fresh processes otherwise re-pay every jit compile —
        20-40 s/kernel through the TPU remote-compile path). Explicit
        JAX_COMPILATION_CACHE_DIR wins; LATTICE_XLA_CACHE=off disables.
        The assertion target is jax's LIVE config value, not os.environ:
        jax snapshots the env at import time and the site hook preloads
        it, so env mutation after import is inert (review finding r4)."""
        import os

        import jax
        from jax._src import config as jax_config

        def cache_dir():
            return jax_config.compilation_cache_dir.value

        original = cache_dir()  # conftest's /tmp/lattice_jax_cache
        root, env = repo
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR", raising=False)
        assert run(["settings"], env) == 0
        capsys.readouterr()
        from lattice_tpu.main import _xla_cache_dir
        assert cache_dir() == _xla_cache_dir()
        assert "lattice_tpu/xla-" in cache_dir()  # host-fingerprinted
        monkeypatch.setenv("JAX_COMPILATION_CACHE_DIR", str(tmp_path))
        assert run(["settings"], env) == 0
        capsys.readouterr()
        assert cache_dir() == str(tmp_path)
        monkeypatch.delenv("JAX_COMPILATION_CACHE_DIR")
        monkeypatch.setenv("LATTICE_XLA_CACHE", "off")
        assert run(["settings"], env) == 0
        capsys.readouterr()
        assert cache_dir() is None
        # restore the suite's process-wide cache (conftest's env default)
        jax.config.update("jax_compilation_cache_dir", original)


class TestDeepSearchFlag:
    def test_search_deep_ranks_corpus_wide(self, repo, capsys):
        root, env = repo
        run(["index", str(root), "--project", "cli-test"], env)
        capsys.readouterr()
        assert run(["search", "who calls validate_email_format",
                    "--path", str(root), "--deep", "--json"], env) == 0
        results = json.loads(capsys.readouterr().out)
        assert results
        names = [r["name"] for r in results]
        assert any("validate_email_format" in n for n in names)


class TestServeLifecycle:
    def test_sigterm_drains_and_exits_cleanly(self, repo, capsys, tmp_path):
        """`lattice serve` must drain on SIGTERM (orchestrator stop) —
        exit 0 through the shutdown path, not a mid-batch kill."""
        import os
        import signal
        import subprocess
        import sys
        import time
        import urllib.request

        root, env = repo
        assert run(["index", str(root), "--project", "serve-term"],
                   env) == 0
        capsys.readouterr()
        proc = subprocess.Popen(
            [sys.executable, "-m", "lattice_tpu.main", "--env", str(env),
             "serve", "--path", str(root), "--port", "0",
             "--max-batch", "4", "--warmup"],
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
            cwd="/root/repo",
            env={**os.environ, "LATTICE_PLATFORM": "cpu",
                 "JAX_PLATFORMS": "cpu"})
        try:
            # skip XLA AOT-loader warnings etc.; the banner is the first
            # line that names the listening address
            line = ""
            for _ in range(50):
                line = proc.stdout.readline()
                if "serving" in line and "http://" in line:
                    break
            assert "serving" in line and "http://" in line
            url = line.split("http://")[1].split()[0]
            with urllib.request.urlopen(f"http://{url}/healthz",
                                        timeout=30) as r:
                assert r.status == 200
            # --warmup runs on a background thread; healthz must flip
            # warm=true once the pad buckets are compiled
            import json
            deadline = time.monotonic() + 120
            warm = False
            while time.monotonic() < deadline and not warm:
                with urllib.request.urlopen(f"http://{url}/healthz",
                                            timeout=30) as r:
                    warm = json.loads(r.read())["warm"]
                if not warm:
                    time.sleep(0.2)
            assert warm, "--warmup never reported warm=true"
            proc.send_signal(signal.SIGTERM)
            out, _ = proc.communicate(timeout=60)
            assert proc.returncode == 0, out
            assert "shutting down" in out
        finally:
            if proc.poll() is None:
                proc.kill()
