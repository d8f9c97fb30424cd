"""AOT serving export: serialize -> deserialize -> call round trip.

The exported StableHLO artifact must reproduce the live forward
bit-for-bit on the same platform and be loadable without the model
class (deployment contract)."""

import numpy as np
import jax
import jax.numpy as jnp

from cobevt_tpu.models.corpbevt import CorpBEVT
from cobevt_tpu.tools.export_serving import export_model, load_exported

from tests.test_train_multichip import tiny_batch, tiny_config


def test_export_round_trip(tmp_path):
    cfg = tiny_config(max_cav=2)
    model = CorpBEVT(cfg)
    batch = tiny_batch(B=1, L=2)
    variables = model.init(jax.random.PRNGKey(0), batch, False)

    blob = export_model(model, variables, batch,
                        platforms=[jax.default_backend()])
    path = tmp_path / "m.stablehlo"
    path.write_bytes(blob)

    exported = load_exported(path.read_bytes())
    got = jax.jit(exported.call)(variables, batch)
    want = model.apply(variables, batch, False)
    for k in want:
        # same StableHLO, but the deserialized artifact may re-fuse
        # differently — tight tolerance rather than bit-equality
        np.testing.assert_allclose(np.asarray(got[k]),
                                   np.asarray(want[k]), atol=1e-5,
                                   rtol=1e-5)

    # shape contract is enforced at call time
    bad = dict(batch, agent_mask=jnp.ones((1, 3), jnp.float32))
    try:
        jax.jit(exported.call)(variables, bad)
        raised = False
    except Exception:
        raised = True
    assert raised
