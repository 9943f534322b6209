"""visualize_net — inspect a network's structure and compiled form.

The reference renders a graphviz plot of the MXNet symbol (reference
tools/visualize_net.py:19-25). The TPU-native equivalents are (a) a flax
``tabulate`` table of every module/param/shape, and (b) the lowered
StableHLO of the jitted forward — what XLA actually compiles.

Usage::

    python -m dspnet_tpu.tools.visualize_net --network resnet-50_multi \
        --data-shape 3,512,1024
    python -m dspnet_tpu.tools.visualize_net --network vgg16_reduced \
        --data-shape 300 --hlo net.stablehlo.txt
"""

from __future__ import annotations

import argparse


def main(argv=None):
    p = argparse.ArgumentParser(description="Print a network summary (+ optional HLO).")
    p.add_argument("--network", default="vgg16_reduced")
    p.add_argument("--num-classes", type=int, default=20)
    p.add_argument("--data-shape", default="300")
    p.add_argument("--train", action="store_true", help="summarize the train-mode graph")
    p.add_argument("--hlo", default="", help="write lowered StableHLO text here")
    args = p.parse_args(argv)

    import jax
    import jax.numpy as jnp

    from dspnet_tpu.api import create_model
    from dspnet_tpu.cli.common import parse_data_shape

    H, W = parse_data_shape(args.data_shape)
    bundle = create_model(args.network, (H, W), args.num_classes)
    model = bundle.model
    x = jnp.zeros((1, H, W, 3), jnp.float32)

    import flax.linen as nn

    print(nn.tabulate(model, jax.random.PRNGKey(0),
                      depth=2, console_kwargs={"width": 120})(x, train=args.train))
    print(f"task={bundle.task} anchors={bundle.num_anchors} input={H}x{W}")

    if args.hlo:
        variables = jax.eval_shape(lambda: model.init(jax.random.PRNGKey(0), x,
                                                      train=args.train))
        mutable = ["batch_stats"] if args.train else False
        lowered = jax.jit(
            lambda v, x: model.apply(v, x, train=args.train, mutable=mutable)
        ).lower(variables, x)
        with open(args.hlo, "w") as f:
            f.write(lowered.as_text())
        print(f"wrote {args.hlo}")


if __name__ == "__main__":
    main()
