"""Lint: geometry/estimator matmuls must pin precision="highest".

TPU's DEFAULT matmul precision is bf16.  An unguarded ``@``/``jnp.dot``/
``jnp.einsum`` in the camera/epipolar/estimator layers quantizes
coordinates to ~3 digits ON CHIP ONLY — CPU tests run f32 and stay green,
which is exactly how multiview silently lost 0.35 deg/frame in round 2.
This AST lint fails when a new unguarded matmul appears in those layers.

Image-processing code (``ops/image.py``, the flow pyramid, Pallas kernels)
is exempt: pixel-domain matmuls tolerate bf16 and some are deliberate
(one-hot MXU shifts).
"""

import ast
import os

import pytest

ROOT = os.path.join(os.path.dirname(__file__), "..", "ofps_tpu")

# Precision-critical layers: every matmul must be guarded.
CHECKED = [
    "core/camera.py",
    "core/quat.py",
    "core/motion.py",
    "ops/epipolar.py",
    "ops/five_point.py",
    "ops/homography.py",
    "ops/robust.py",
    "ops/solve.py",
    "estimators/almeida.py",
    "estimators/homography.py",
    "estimators/multiview.py",
    "estimators/libmv.py",
]


def _violations(path):
    src = open(path).read()
    tree = ast.parse(src)
    bad = []
    for node in ast.walk(tree):
        # Bare `a @ b` on jnp arrays cannot carry a precision argument.
        if isinstance(node, ast.BinOp) and isinstance(node.op, ast.MatMult):
            bad.append((node.lineno, "@ operator"))
        if isinstance(node, ast.Call):
            fn = node.func
            name = ""
            if isinstance(fn, ast.Attribute):
                name = fn.attr
            elif isinstance(fn, ast.Name):
                name = fn.id
            if name in ("dot", "matmul", "einsum", "tensordot"):
                kw = {k.arg for k in node.keywords}
                if name == "dot" and "preferred_element_type" in kw:
                    continue  # pallas in-kernel MXU dot (explicit f32 accum)
                if "precision" not in kw:
                    bad.append((node.lineno, name))
    return bad


@pytest.mark.parametrize("rel", CHECKED)
def test_no_unguarded_matmuls(rel):
    path = os.path.join(ROOT, rel)
    bad = [
        (ln, what)
        for ln, what in _violations(path)
        # functools.partial(jnp.matmul, precision=...) _mm helpers show up
        # as a call WITH precision kw, so anything flagged here is real.
    ]
    assert not bad, f"{rel}: unguarded matmul(s) {bad} — add precision='highest'"
