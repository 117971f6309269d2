"""Render density-movie frames dumped by the CLIs into a GIF.

The reference's README showcases ``density2D.gif`` (produced from the
``nframes`` trajectory path, ``src/flow.py:46-48``); it ships no plotting
code.  This script closes that gap:

    python -m fermiflow_tpu.cli.ground_state ... --movie frames.npy
    python examples/render_density_movie.py frames.npy density2D.gif
"""

import sys

import matplotlib

matplotlib.use("Agg")
import matplotlib.animation as animation
import matplotlib.pyplot as plt
import numpy as np


def main(frames_path: str, out_path: str, extent: float = 4.0, bins: int = 80):
    frames = np.load(frames_path)  # (nframes, nwalkers, n, dim)
    nframes = frames.shape[0]
    fig, ax = plt.subplots(figsize=(4, 4), dpi=110)
    ax.set_axis_off()
    fig.subplots_adjust(0, 0, 1, 1)

    def density(i):
        pts = frames[i].reshape(-1, 2)
        H, _, _ = np.histogram2d(
            pts[:, 0], pts[:, 1], bins=bins,
            range=[[-extent, extent], [-extent, extent]],
        )
        return H.T

    im = ax.imshow(
        density(0), origin="lower", cmap="inferno",
        extent=[-extent, extent, -extent, extent], animated=True,
    )

    def update(i):
        im.set_array(density(i))
        im.autoscale()
        return (im,)

    anim = animation.FuncAnimation(fig, update, frames=nframes, blit=True)
    anim.save(out_path, writer=animation.PillowWriter(fps=10))
    print(f"wrote {out_path}: {nframes} frames")


if __name__ == "__main__":
    if len(sys.argv) < 3:
        sys.exit("usage: render_density_movie.py frames.npy out.gif")
    main(sys.argv[1], sys.argv[2])
