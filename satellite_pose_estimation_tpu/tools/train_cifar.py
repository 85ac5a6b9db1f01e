"""CIFAR-10 classification sanity task (the upstream R2 sanity-check task,
R2/nn/arch/classification.py + src/data/cifar10). Trains the MResNet
classifier on CIFAR-10 batch files already on disk:

    python -m satellite_pose_estimation_tpu.tools.train_cifar \
        --root /data/cifar-10-batches-py --epochs 5
"""
from __future__ import annotations

import argparse

import jax
import jax.numpy as jnp
import numpy as np
import optax


def main(args):
    from ..data.cifar10 import CIFAR10
    from ..models.classification import Classification

    train_ds = CIFAR10(args.root, train=True)
    test_ds = CIFAR10(args.root, train=False)
    model = Classification(num_classes=10)

    rng = jax.random.PRNGKey(args.seed)
    variables = model.init(rng, jnp.zeros((2, 32, 32, 3)), train=True)
    params, batch_stats = variables["params"], variables.get("batch_stats", {})
    tx = optax.adamw(args.lr, weight_decay=1e-4)
    opt_state = tx.init(params)

    @jax.jit
    def train_step(params, batch_stats, opt_state, images, labels):
        def loss_fn(p):
            logits, updates = model.apply(
                {"params": p, "batch_stats": batch_stats}, images,
                train=True, mutable=["batch_stats"],
            )
            loss = optax.softmax_cross_entropy_with_integer_labels(
                logits, labels
            ).mean()
            return loss, (logits, updates["batch_stats"])

        (loss, (logits, new_stats)), grads = jax.value_and_grad(
            loss_fn, has_aux=True
        )(params)
        updates, opt_state = tx.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        acc = (logits.argmax(-1) == labels).mean()
        return params, new_stats, opt_state, loss, acc

    @jax.jit
    def eval_step(params, batch_stats, images, labels):
        logits = model.apply(
            {"params": params, "batch_stats": batch_stats}, images, train=False
        )
        return (logits.argmax(-1) == labels).mean()

    np_rng = np.random.RandomState(args.seed)
    for epoch in range(args.epochs):
        losses, accs = [], []
        for images, labels in train_ds.batches(args.batch, np_rng):
            params, batch_stats, opt_state, loss, acc = train_step(
                params, batch_stats, opt_state,
                jnp.asarray(images), jnp.asarray(labels),
            )
            losses.append(float(loss))
            accs.append(float(acc))
        test_accs = [
            float(eval_step(params, batch_stats, jnp.asarray(i), jnp.asarray(l)))
            for i, l in test_ds.batches(args.batch)
        ]
        print(f"epoch {epoch}: loss {np.mean(losses):.4f} "
              f"train acc {np.mean(accs):.4f} test acc {np.mean(test_accs):.4f}")


if __name__ == "__main__":
    parser = argparse.ArgumentParser()
    parser.add_argument("--root", required=True)
    parser.add_argument("--epochs", type=int, default=5)
    parser.add_argument("--batch", type=int, default=128)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--seed", type=int, default=0)
    main(parser.parse_args())
