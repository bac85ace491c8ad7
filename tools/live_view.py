"""Interactive workspace slice explorer — the realtime-viewer counterpart.

TPU-native analogue of the reference's legacy SFML/OpenGL viewer
(`cuda_openGLmess.cu:1272-1632` ``AutoEstimator`` + ``OpenGL_viz.cpp``):
a screen-sized query grid is re-evaluated through the distance kernel
every time the slice moves, the result norm is mapped through viridis
(the reference bakes its own LUT, ``cuda_virdis.cu:118-150``; matplotlib's
colormap serves here), and a numerical-derivative shading mode mirrors
``derivate_output`` (``cuda_openGLmess.cu:1474-1490``).

Two modes:

* ``--interactive`` — matplotlib window with y/z slice sliders, an axis
  toggle (the reference's ``switch_zy``), and a norm/derivative toggle.
  Each slider move re-runs the kernel on the device: on a TPU chip a
  1920x1080 frame is ~0.7 ms of kernel time, far beyond realtime.
* default (headless) — steps the slice through ``--frames`` positions
  like a user dragging, re-evaluating every frame, and reports the
  achieved frame rate; saves first/mid/last frames as PNGs.  This is the
  CI-able proof that the pipeline sustains interactive rates.
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp  # noqa: E402

from legmov_tpu.models.leg import get_m2_leg, get_moonbot_leg  # noqa: E402


def make_frame_fn(leg, width, height, scale, use_pallas=True):
    """Returns ``frame(cut, axis_is_z) -> [H, W] float32 norm image``.

    The grid is built once on device (input_as_grid,
    cuda_openGLmess.cu:1336-1368 builds it per frame on GPU; XLA fuses the
    same construction into the kernel here), the cut coordinate is a
    traced scalar so slice moves do NOT recompile.
    """
    xs = (jnp.arange(width, dtype=jnp.float32) - width / 4.0) * scale
    vs = (jnp.arange(height, dtype=jnp.float32) - height / 2.0) * scale

    kern = None
    if use_pallas and jax.default_backend() == "tpu":
        try:
            from legmov_tpu.ops.pallas_kernels import make_distance_kernel

            kern = make_distance_kernel(leg)
        except Exception:
            kern = None
    if kern is None:
        from legmov_tpu.ops.distance import distance as _distance

        def kern_soa(x, y, z):
            ok, vec = _distance(jnp.stack([x, y, z], -1), leg)
            return ok, vec[:, 0], vec[:, 1], vec[:, 2]
    else:
        kern_soa = kern.soa

    @jax.jit
    def frame(cut, axis_is_z):
        X, V = jnp.meshgrid(xs, vs, indexing="xy")
        C = jnp.full_like(X, cut)
        # axis_is_z: slice y = cut, image axes (x, z); else slice z = cut
        y = jnp.where(axis_is_z, C, V)
        z = jnp.where(axis_is_z, V, C)
        ok, dx, dy, dz = kern_soa(
            X.reshape(-1), y.reshape(-1), z.reshape(-1)
        )
        norm = jnp.sqrt(dx * dx + dy * dy + dz * dz)
        return norm.reshape(height, width)

    return frame


def derivative_shade(img: np.ndarray) -> np.ndarray:
    """|d norm / d pixel| magnitude (derivate_output equivalent)."""
    gy, gx = np.gradient(img)
    return np.hypot(gx, gy)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--leg", choices=("moonbot", "m2"), default="m2")
    ap.add_argument("--width", type=int, default=1920)
    ap.add_argument("--height", type=int, default=1080)
    ap.add_argument("--scale", type=float, default=0.5,
                    help="mm per pixel")
    ap.add_argument("--frames", type=int, default=60)
    ap.add_argument("--interactive", action="store_true")
    ap.add_argument("--out", default="bdata/live_view")
    args = ap.parse_args()

    leg = get_m2_leg() if args.leg == "m2" else get_moonbot_leg()
    frame = make_frame_fn(leg, args.width, args.height, args.scale)

    if args.interactive:
        import matplotlib.pyplot as plt
        from matplotlib.widgets import Button, Slider

        fig, ax = plt.subplots(figsize=(10, 6))
        plt.subplots_adjust(bottom=0.22)
        state = {"axis_z": True, "deriv": False}

        def render(cut):
            img = np.asarray(frame(jnp.float32(cut),
                                   jnp.bool_(state["axis_z"])))
            if state["deriv"]:
                img = derivative_shade(img)
            return img

        im = ax.imshow(render(0.0), cmap="viridis", origin="lower")
        sax = plt.axes([0.15, 0.08, 0.6, 0.04])
        slider = Slider(sax, "cut (mm)", -500.0, 500.0, valinit=0.0)
        bax = plt.axes([0.8, 0.08, 0.08, 0.05])
        btn = Button(bax, "y/z")
        dax = plt.axes([0.89, 0.08, 0.08, 0.05])
        dbtn = Button(dax, "d/dx")

        def update(_):
            im.set_data(render(slider.val))
            fig.canvas.draw_idle()

        def toggle(_):
            state["axis_z"] = not state["axis_z"]
            update(None)

        def toggle_d(_):
            state["deriv"] = not state["deriv"]
            update(None)

        slider.on_changed(update)
        btn.on_clicked(toggle)
        dbtn.on_clicked(toggle_d)
        plt.show()
        return

    # headless: sweep the cut like a user dragging the slider
    os.makedirs(args.out, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    cuts = np.linspace(-400, 400, args.frames).astype(np.float32)
    img = np.asarray(frame(jnp.float32(cuts[0]), jnp.bool_(True)))  # warm
    t0 = time.perf_counter()
    last = None
    for c in cuts:
        last = frame(jnp.float32(c), jnp.bool_(True))
    np.asarray(last)  # fetch once; frames are device-chained by data dep
    dt = time.perf_counter() - t0
    fps = args.frames / dt
    print(f"{args.frames} frames {args.width}x{args.height} in {dt:.3f}s "
          f"-> {fps:.1f} fps (incl. dispatch; kernel-only is higher)")
    for tag, c in (("first", cuts[0]), ("mid", cuts[len(cuts) // 2]),
                   ("last", cuts[-1])):
        img = np.asarray(frame(jnp.float32(c), jnp.bool_(True)))
        for mode, data in (("norm", img), ("deriv", derivative_shade(img))):
            plt.figure(figsize=(8, 4.5))
            plt.imshow(data, cmap="viridis", origin="lower")
            plt.title(f"{args.leg} distance {mode}, y={c:.0f} mm")
            plt.axis("off")
            plt.savefig(
                os.path.join(args.out, f"{tag}_{mode}.png"),
                dpi=110, bbox_inches="tight",
            )
            plt.close()
    print("wrote frames to", args.out)


if __name__ == "__main__":
    main()
