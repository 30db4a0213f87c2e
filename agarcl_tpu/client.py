"""Interactive human client — counterpart of the reference's OpenGL client
(/root/reference/agario/client/client.hpp:26-190: playable game vs 8 bots,
mouse steers, SPACE=split, W=feed, 30 FPS frame-timed loop, leaderboard).

Renders through the same analytic rasterizer as the screen observation
(obs/screen.py) into a matplotlib window; falls back to an ASCII terminal
viewer when no display is available. Also provides `replay()` for viewing
recorded frame sequences (the host-side viewer from SURVEY §2 item 9).
"""

from __future__ import annotations

import sys
import time

import numpy as np

from agarcl_tpu.config import EnvConfig


class Client:
    """Playable game: engine + 2 bots of each type, like client.hpp:62-75."""

    def __init__(self, arena_size=250, num_pellets=500, num_viruses=10,
                 num_bots=8, screen=512, seed=0):
        import jax
        from agarcl_tpu.env import env_reset, env_step
        from agarcl_tpu.obs.screen import ScreenObsConfig, screen_frame
        import functools

        self.cfg = EnvConfig(num_agents=1, ticks_per_step=1,
                             arena_size=arena_size, num_pellets=num_pellets,
                             num_viruses=num_viruses, num_bots=num_bots,
                             mode=0)
        self.ocfg = ScreenObsConfig(screen_len=screen, agent_view=False)
        self._step = jax.jit(functools.partial(
            env_step, self.cfg, obs_fn=functools.partial(
                screen_frame, self.cfg, self.ocfg)))
        self._reset = jax.jit(functools.partial(env_reset, self.cfg))
        self.state = self._reset(np.uint32(seed))
        self.action = 0
        self.direction = np.zeros(2, np.float32)
        self._mouse = None  # last cursor pixel (xpos, ypos), y down from top

    def to_target(self, xpos, ypos):
        """Screen pixel -> world target through the camera transform,
        matching Renderer::to_target (renderer.hpp:62-78): unproject NDC at
        the far plane through inverse(perspective * lookAt). The camera sits
        over the player centroid at z = clamp(100 + mass/10, 100, 900)
        (renderer.hpp:91-93) with a 45-degree fov and square aspect, so the
        inverse is the closed form  centroid + ndc * tan(22.5deg) * (1 + z)
        (verified against the full matrix inverse)."""
        S = float(self.ocfg.screen_len)
        ndc_x = 2.0 * (xpos / S) - 1.0
        ndc_y = 1.0 - 2.0 * (ypos / S)
        mass = float(np.asarray(self.state.player_mass())[0])
        cz = min(max(100.0 + mass / 10.0, 100.0), 900.0)
        half = np.tan(np.radians(45.0) / 2.0)
        cx, cy = np.asarray(self.state.player_centroid()[0])
        return (cx + ndc_x * half * (1.0 + cz),
                cy + ndc_y * half * (1.0 + cz))

    def set_mouse(self, xpos, ypos):
        """Record the cursor pixel; each step() re-derives the world target
        from it (the reference client reads the cursor every frame,
        client.hpp:171-187)."""
        self._mouse = (float(xpos), float(ypos))

    def leaderboard(self):
        """Sorted (name, mass) like GameState's operator<< (GameState.hpp:72-94)."""
        masses = np.asarray(self.state.player_mass())
        bots = self.cfg.bot_types()
        names = ["you"] + [f"{['','Hungry','HungryShy','Aggressive','AggressiveShy'][b]}Bot{i}"
                           for i, b in enumerate(bots[1:], 1)]
        order = np.argsort(-masses)
        return [(names[i], int(masses[i])) for i in order]

    def step(self):
        if self._mouse is not None:
            tx, ty = self.to_target(*self._mouse)
            cx, cy = np.asarray(self.state.player_centroid()[0])
            # apply_actions sets target = centroid + 10*(dx,dy) without
            # clipping, so this reproduces the unprojected target exactly
            self.direction = np.array([(tx - cx) / 10.0, (ty - cy) / 10.0],
                                      np.float32)
        acts = np.array([[self.direction[0], self.direction[1],
                          float(self.action)]], np.float32)
        self.state, obs, rewards, dones = self._step(self.state, acts)
        self.action = 0
        return np.asarray(obs[-1, 0])[::-1]  # row-0-top frame

    def play(self, max_fps=30.0, max_seconds=None):
        """Interactive matplotlib loop: move with the mouse, SPACE=split,
        W=feed, Q quits."""
        import matplotlib
        import matplotlib.pyplot as plt

        fig, ax = plt.subplots(figsize=(6, 6))
        img = ax.imshow(self.step())
        ax.set_axis_off()
        title = ax.set_title("agarcl_tpu")
        running = {"on": True}

        def on_move(event):
            if event.inaxes is ax and event.xdata is not None:
                # imshow origin='upper' puts ydata 0 at the top of the
                # window, same convention as the GLFW cursor
                self.set_mouse(event.xdata, event.ydata)

        def on_key(event):
            if event.key == " ":
                self.action = 2
            elif event.key in ("w", "W"):
                self.action = 1
            elif event.key in ("q", "Q"):
                running["on"] = False

        fig.canvas.mpl_connect("motion_notify_event", on_move)
        fig.canvas.mpl_connect("key_press_event", on_key)
        plt.ion()
        plt.show()
        t_start = time.time()
        while running["on"] and plt.fignum_exists(fig.number):
            t0 = time.time()
            frame = self.step()
            img.set_data(frame)
            lb = self.leaderboard()[:3]
            title.set_text("  ".join(f"{n}:{m}" for n, m in lb))
            fig.canvas.draw_idle()
            plt.pause(max(1.0 / max_fps - (time.time() - t0), 1e-3))
            if max_seconds and time.time() - t_start > max_seconds:
                break

    def play_ascii(self, steps=100, size=40, fps=10.0):
        """Headless terminal viewer: the agent chases pellets automatically."""
        from agarcl_tpu.obs.screen import ScreenObsConfig
        chars = {0: " ", 1: ".", 2: "o", 3: "*", 4: "@", 5: "#", 6: "V"}
        for t in range(steps):
            s = self.state
            c = np.asarray(s.player_centroid()[0])
            ppos, palv = s.pellet_xy_alive(self.cfg)
            pel = np.asarray(ppos)
            alive = np.asarray(palv)
            d = np.linalg.norm(pel - c, axis=1)
            d[~alive] = 1e9
            v = pel[d.argmin()] - c
            self.direction = np.clip(v / (np.abs(v).max() + 1e-9), -1, 1)
            frame = self.step()
            if t % max(1, int(30 / fps)) == 0:
                from agarcl_tpu.obs.screen import _class_map
                import jax
                cls = np.asarray(_class_map(self.cfg, self.state, size))[0][::-1]
                sys.stdout.write("\x1b[H\x1b[2J")
                for row in cls:
                    sys.stdout.write("".join(chars[int(x)] for x in row) + "\n")
                lb = self.leaderboard()[:3]
                sys.stdout.write(" | ".join(f"{n}:{m}" for n, m in lb) + "\n")
                sys.stdout.flush()
                time.sleep(1.0 / fps)


def replay(frames, fps=30.0):
    """View a recorded list of RGB frames (matplotlib)."""
    import matplotlib.pyplot as plt
    fig, ax = plt.subplots()
    img = ax.imshow(frames[0])
    ax.set_axis_off()
    plt.ion()
    plt.show()
    for f in frames[1:]:
        img.set_data(f)
        fig.canvas.draw_idle()
        plt.pause(1.0 / fps)


if __name__ == "__main__":
    import argparse
    ap = argparse.ArgumentParser()
    ap.add_argument("--ascii", action="store_true")
    ap.add_argument("--steps", type=int, default=100)
    args = ap.parse_args()
    c = Client()
    if args.ascii:
        c.play_ascii(steps=args.steps)
    else:
        c.play()
