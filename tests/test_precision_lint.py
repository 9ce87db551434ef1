"""Lint: no unpinned `@` matmul ships in jax-traced geometry code.

TPU matmuls default to bf16 (CLAUDE.md performance rules): a coordinate
matmul left at default precision silently injects ~0.2 m error at LiDAR
scale against the 0.6 m TE criterion. Every geometry einsum/matmul must pin
``precision="highest"`` — the `@` operator can't, so jax-traced modules may
not use it on arrays at all unless the specific line is allowlisted below
as verified host-side numpy (exact on CPU, no bf16 risk).

Round-4 guard demanded by VERDICT.md weak #5 / next-round #6.
"""
from __future__ import annotations

import ast
import pathlib

REPO = pathlib.Path(__file__).resolve().parents[1]
PKG = REPO / "lidarreg"

# (relative path, exact stripped source line) pairs verified to be
# host-side numpy (never jax-traced). Adding a new entry requires the same
# verification: the operands must be np.ndarray at every call site.
ALLOWED_NUMPY_LINES = {
    ("multiway/fragments.py", "odo = T @ odo              # T_{s+1 <- 0}"),
    ("multiway/trajectory.py",
     "aligned = est_t @ np.asarray(R[0]).T + np.asarray(t[0])"),
    ("multiway/trajectory.py", "odometry.append(odometry[-1] @ T)"),
    ("cli/multiway.py", "dirs = d @ Rwc.T"),
    # me_oracle: dense numpy reference oracle, test-only by design
    ("models/me_oracle.py", "out[o] += feats_in[row] @ weights_me[j]"),
    # cli/train fcgf val yaw probes: host-side numpy float64 on the raw
    # clouds/motions BEFORE device transfer (test_data.py pins the math)
    ("cli/train.py", "a = (a @ M[:3, :3].T).astype(a.dtype)"),
    ("cli/train.py", "T = np.asarray(T, np.float64) @ M.T  # inv = transpose"),
}


def _module_imports_jax(tree: ast.Module) -> bool:
    for node in ast.walk(tree):
        if isinstance(node, ast.Import):
            if any(a.name == "jax" or a.name.startswith("jax.")
                   for a in node.names):
                return True
        elif isinstance(node, ast.ImportFrom):
            if node.module and (node.module == "jax"
                                or node.module.startswith("jax.")):
                return True
    return False


def _matmul_lines(tree: ast.Module, source_lines: list[str]):
    for node in ast.walk(tree):
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            yield node.lineno, source_lines[node.lineno - 1].strip()


def test_no_unpinned_matmul_in_jax_modules():
    violations = []
    for path in sorted(PKG.rglob("*.py")):
        rel = path.relative_to(PKG).as_posix()
        text = path.read_text()
        tree = ast.parse(text)
        if not _module_imports_jax(tree):
            continue  # pure-numpy module: exact f32/f64 on host
        lines = text.splitlines()
        for lineno, stripped in _matmul_lines(tree, lines):
            if (rel, stripped) not in ALLOWED_NUMPY_LINES:
                violations.append(f"{rel}:{lineno}: {stripped}")
    assert not violations, (
        "Unpinned `@` matmul in jax-importing module(s) — use "
        'jnp.einsum/jnp.matmul with precision="highest" (geometry) or, if '
        "verified host-side numpy, add the exact line to "
        "ALLOWED_NUMPY_LINES:\n" + "\n".join(violations)
    )


def test_allowlist_entries_still_exist():
    """Stale allowlist entries mean the code moved — re-verify and update."""
    stale = []
    for rel, line in sorted(ALLOWED_NUMPY_LINES):
        text = (PKG / rel).read_text()
        if line not in [ln.strip() for ln in text.splitlines()]:
            stale.append(f"{rel}: {line}")
    assert not stale, "Allowlist lines no longer present:\n" + "\n".join(stale)
