# %% [markdown]
# # Hands-on Tutorial: Deep Imbalanced Regression, TPU-native
#
# JAX/Flax walkthrough of LDS and FDS on a small tabular regression problem —
# the TPU-native counterpart of the reference's Boston-Housing notebook
# (`tutorial/tutorial.ipynb` in YyzHarry/imbalanced-regression). It shows how
# to apply the framework's building blocks to a *custom* dataset:
#
# 1. inspect the (imbalanced) label distribution,
# 2. turn it into LDS effective-density sample weights,
# 3. train a small MLP regressor with weighted losses,
# 4. add FDS feature calibration on the penultimate layer,
# 5. evaluate with shot-partitioned (many/median/few) metrics.
#
# Run as a script (`python tutorial/tutorial.py`) or open in a notebook UI
# that understands `# %%` cells.

# %%
import numpy as np
import jax
import jax.numpy as jnp
import flax.linen as nn
import optax

from imbalanced_regression_tpu.ops import (
    get_lds_kernel_window,
    prepare_weights_age,
    weighted_l1_loss,
)
from imbalanced_regression_tpu.fds import (
    FDSConfig, fds_init, fds_smooth, fds_update_last_epoch_stats,
    fds_update_running_stats,
)
from imbalanced_regression_tpu.utils.metrics import shot_metrics, regression_metrics

# %% [markdown]
# ## 1. An imbalanced regression dataset
#
# A housing-style tabular problem: 13 features, a continuous price-like
# target whose distribution has a heavy head and a sparse tail (most targets
# cluster around 20, few above 40) — the classic DIR setting.

# %%
rng = np.random.default_rng(0)
N, D = 2000, 13
X = rng.normal(size=(N, D)).astype(np.float32)
true_w = rng.normal(size=(D,)).astype(np.float32)
y = 22.0 + X @ true_w * 3.0 + rng.normal(0, 2.0, N).astype(np.float32)
y = np.clip(y, 0, 50)
# amplify the imbalance: subsample the tail
keep = (y < 35) | (rng.random(N) < 0.15)
X, y = X[keep], y[keep]
print(f"{len(y)} samples; labels 0-50; >35: {(y > 35).sum()} samples")

# %% [markdown]
# ## 2. LDS: from empirical density to sample weights
#
# The empirical label histogram is smoothed with a gaussian kernel window —
# acknowledging that nearby labels are informative for each other — and the
# *effective* density is inverted into per-sample weights (mean 1).

# %%
window = get_lds_kernel_window("gaussian", ks=5, sigma=2)
print("LDS kernel window:", np.round(window, 4))
weights = prepare_weights_age(y, reweight="sqrt_inv", max_target=51, lds=True,
                              lds_kernel="gaussian", lds_ks=5, lds_sigma=2)
print("weight of a tail sample:", weights[y > 40][:3])
print("weight of a head sample:", weights[(y > 20) & (y < 25)][:3])

# %% [markdown]
# ## 3. A small MLP regressor (Flax), trained with weighted L1

# %%
class MLPBackbone(nn.Module):
    hidden: int = 64

    @nn.compact
    def __call__(self, x, train: bool = False):
        x = nn.relu(nn.Dense(self.hidden)(x))
        x = nn.relu(nn.Dense(self.hidden)(x))
        return x  # penultimate features — the FDS hook point


head = nn.Dense(1)
backbone = MLPBackbone()

params = {
    "backbone": backbone.init(jax.random.key(0), X[:1])["params"],
    "head": head.init(jax.random.key(1), jnp.zeros((1, 64)))["params"],
}
tx = optax.adam(1e-3)
opt_state = tx.init(params)

fds_cfg = FDSConfig.for_age(feature_dim=64, bucket_num=51, bucket_start=0,
                            start_update=0, start_smooth=1, ks=5, sigma=2)
fds_state = fds_init(fds_cfg)


@jax.jit
def train_step(params, opt_state, fds_state, xb, yb, wb, epoch):
    def loss_fn(p):
        feats = backbone.apply({"params": p["backbone"]}, xb)
        feats = fds_smooth(fds_cfg, fds_state, feats, yb, epoch)
        pred = head.apply({"params": p["head"]}, feats)
        return weighted_l1_loss(pred, yb[:, None], wb[:, None])

    loss, grads = jax.value_and_grad(loss_fn)(params)
    updates, opt_state = tx.update(grads, opt_state, params)
    return optax.apply_updates(params, updates), opt_state, loss


@jax.jit
def feature_pass(params, xb):
    return backbone.apply({"params": params["backbone"]}, xb)


# %% [markdown]
# ## 4. Training loop with the FDS lifecycle
#
# Per epoch: train with smoothed features → snapshot + kernel-smooth the
# running bucket statistics → update them with this epoch's features.

# %%
Xj, yj, wj = jnp.asarray(X), jnp.asarray(y), jnp.asarray(weights)
batch = 128
for epoch in range(15):
    perm = rng.permutation(len(y))
    for s in range(0, len(y) - batch + 1, batch):
        idx = perm[s : s + batch]
        params, opt_state, loss = train_step(
            params, opt_state, fds_state, Xj[idx], yj[idx], wj[idx], epoch)
    feats = feature_pass(params, Xj)
    fds_state = fds_update_last_epoch_stats(fds_cfg, fds_state, epoch)
    fds_state = fds_update_running_stats(fds_cfg, fds_state, feats, yj, epoch)
    if epoch % 5 == 0:
        print(f"epoch {epoch}: loss {float(loss):.3f}")

# %% [markdown]
# ## 5. Shot-partitioned evaluation
#
# Regions are defined by *training* label frequency: many (>100 samples),
# median, few (<20). The balanced error across regions is the DIR headline.

# %%
feats = feature_pass(params, Xj)
preds = head.apply({"params": params["head"]}, feats)[:, 0]
print("overall:", {k: round(v, 3) for k, v in regression_metrics(np.asarray(preds), y).items()})
shots = shot_metrics(np.asarray(preds), np.round(y), np.round(y), many_shot_thr=50, low_shot_thr=10)
for region in ("many", "median", "low"):
    print(region, {k: round(v, 3) for k, v in shots[region].items()})

# %% [markdown]
# That's the whole recipe. For real workloads use the task drivers
# (`imbalanced_regression_tpu.tasks.{age,stsb,nyud2}`), which add the
# unified trainer (GSPMD data parallelism, on-device augmentation, Orbax
# checkpointing, Pallas-fused FDS calibration) on top of these primitives.
