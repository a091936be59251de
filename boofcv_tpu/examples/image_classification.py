"""CNN image classification (DeepBoof wrappers).

Reference analog: examples/recognition/ExampleImageClassification.java —
the VGG-CIFAR10 classifier wrapper.  No pretrained weights ship in this
image, so the oracle is the classic sanity check: overfit the network on
a tiny labeled batch and classify it back perfectly (proves the forward
pass, softmax head, and wrapper plumbing end to end).
"""

from __future__ import annotations

import numpy as np

from boofcv_tpu.examples import setup_backend


def main(argv=None) -> int:
    setup_backend(argv)
    import jax
    import jax.numpy as jnp
    from boofcv_tpu.recognition import deepboof

    rng = np.random.default_rng(0)
    n_cls = 4
    imgs = rng.uniform(0, 1, (n_cls * 2, 32, 32, 3)).astype(np.float32)
    labels = np.arange(n_cls * 2) % n_cls

    params = deepboof.init_vgg_cifar10(jax.random.PRNGKey(0),
                                       num_classes=n_cls)
    x = jnp.asarray(imgs)
    y = jnp.asarray(labels)

    def loss_fn(p):
        logits = deepboof.vgg_cifar10_forward(p, x)
        lp = jax.nn.log_softmax(logits, -1)
        return -jnp.mean(lp[jnp.arange(len(labels)), y])

    loss_grad = jax.jit(jax.value_and_grad(loss_fn))
    lr = 0.003
    for i in range(150):
        loss, g = loss_grad(params)
        params = jax.tree_util.tree_map(lambda a, b: a - lr * b, params, g)
    logits = deepboof.vgg_cifar10_forward(params, x)
    pred = np.asarray(jnp.argmax(logits, -1))
    acc = (pred == labels).mean()
    print(f"VGG-CIFAR10 overfit: loss {float(loss):.3f}, train acc "
          f"{acc:.0%} on {len(labels)} images / {n_cls} classes")

    clf = deepboof.ImageClassifierVggCifar10(params)
    one = clf.classify(imgs[2] * 255.0)
    print(f"wrapper classify(image 2) = {one} (label {labels[2]})")
    ok = acc == 1.0 and one == labels[2]
    print("OK" if ok else "FAILED")
    return 0 if ok else 1


if __name__ == "__main__":
    raise SystemExit(main())
