"""tools/export_torch.py: flax params -> reference torch state_dict.

Covers the exact-inverse round trip (export then import reproduces the
flax params bitwise) for all 19 model classes, torch-side forward parity
(our weights running inside the real reference model match our model),
and the MLflow whole-model layout the reference's load_model consumes
(reference: utils/utils.py:8-25)."""

import os
import sys

import numpy as np
import pytest

REF = "/root/reference"
pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)
torch = pytest.importorskip("torch")
if os.path.isdir(REF) and REF not in sys.path:
    sys.path.append(REF)

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

from test_import_torch import ALL_MODELS, _cfg_for, _ref_model  # noqa: E402
from tools.export_torch import (  # noqa: E402
    export_torch_checkpoint,
    params_to_state_dict,
)
from tools.import_torch import (  # noqa: E402
    load_torch_state_dict,
    state_dict_to_params,
)


def _init_params(name, cfg, H=16, W=16, seed=11):
    import jax
    import jax.numpy as jnp

    from event_flow_tpu.models.registry import get_model

    model = get_model(name, cfg)
    state = model.zero_state(1, H, W)
    voxel = jnp.zeros((1, H, W, int(cfg.get("num_bins", 2))))
    cnt = jnp.zeros((1, H, W, 2))
    params = model.init(jax.random.PRNGKey(seed), voxel, cnt, state)
    return model, params


@pytest.mark.parametrize("name", ALL_MODELS)
def test_export_import_round_trip(name):
    """export(params) then import == params, bitwise, for every model."""
    import jax

    cfg = _cfg_for(name)
    _, params = _init_params(name, cfg)
    template = _ref_model(name, cfg).state_dict()

    sd = params_to_state_dict(params, template, strict=True)
    back = state_dict_to_params(sd, params, strict=True)

    flat_a = jax.tree_util.tree_leaves(params)
    flat_b = jax.tree_util.tree_leaves(back)
    assert len(flat_a) == len(flat_b)
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("name", ["LIFFireNet", "RecEVFlowNet"])
def test_torch_side_forward_parity(name):
    """Our weights exported into the REAL reference model produce the same
    flow as our model — the reverse of the importer's parity test."""
    import jax.numpy as jnp

    B, H, W = 2, 16, 16
    cfg = _cfg_for(name)
    model, params = _init_params(name, cfg, H, W, seed=23)
    ref = _ref_model(name, cfg, seed=5)

    sd = params_to_state_dict(params, ref.state_dict(), strict=True)
    ref.load_state_dict(sd, strict=True)
    ref.eval()
    ref.reset_states()

    state = model.zero_state(B, H, W)
    rng = np.random.default_rng(9)
    for step in range(3):
        cnt = np.abs(rng.normal(0, 2, (B, 2, H, W))).astype(np.float32)
        with torch.no_grad():
            out_t = ref(None, torch.from_numpy(cnt))
        nhwc = jnp.asarray(np.moveaxis(cnt, 1, -1))
        out_j, state = model.apply(params, nhwc * 0, nhwc, state)
        np.testing.assert_allclose(
            np.moveaxis(np.asarray(out_j["flow"][0]), -1, 1),
            out_t["flow"][0].numpy(), atol=1e-5,
            err_msg=f"{name} diverges at step {step}",
        )


def test_mlflow_layout_export(tmp_path):
    """--mlflow-layout writes the whole-model pickle the reference's
    load_model restores; it round-trips through our importer too."""
    import jax

    name = "FireNet"
    cfg = _cfg_for(name)
    _, params = _init_params(name, cfg, seed=3)

    out = tmp_path / "exported_run"
    path = export_torch_checkpoint(params, name, cfg, str(out),
                                   mlflow_layout=True)
    assert path.endswith(os.path.join("artifacts", "model", "data",
                                      "model.pth"))
    sd = load_torch_state_dict(str(out / "artifacts" / "model" / "data"
                                   / "model.pth"))
    back = state_dict_to_params(sd, params, strict=True)
    for a, b in zip(jax.tree_util.tree_leaves(params),
                    jax.tree_util.tree_leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_strict_rejects_mismatched_model(tmp_path):
    """Exporting FireNet params against a LIFFireNet template must fail
    loudly (uncovered torch keys + leftover flax params)."""
    cfg_ann = _cfg_for("FireNet")
    _, params = _init_params("FireNet", cfg_ann)
    template = _ref_model("LIFFireNet", _cfg_for("LIFFireNet")).state_dict()
    with pytest.raises(ValueError, match="export incomplete"):
        params_to_state_dict(params, template, strict=True)
