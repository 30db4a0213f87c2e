// Headless build of the ACTUAL reference engine (/root/reference) behind a
// tiny C ABI for ctypes — the reference-drift harness (VERDICT r3 item 2).
// Compiles the real Engine<renderable=false> + BaseEnvironment semantics
// (no OpenGL, matching agario/CMakeLists.txt:155-183's headless targets).
#include <cstdint>
#include <cstring>
#include <vector>
#include <memory>

#define RENDERABLE false
#include "agario/engine/Engine.hpp"
#include "agario/bots/bots.hpp"

using E = agario::Engine<false>;

struct RefEnv {
  std::unique_ptr<E> eng;
  std::vector<agario::pid> pids;
  int mode = 4;
};

extern "C" {

void *ref_create(int arena, int num_pellets, int num_viruses, int mode,
                 int num_agents, int num_bots, int seed) {
  auto *r = new RefEnv();
  r->mode = mode;
  r->eng = std::make_unique<E>(arena, arena, num_pellets, num_viruses,
                               true /*pellet_regen*/, mode);
  r->eng->seed(seed);
  r->eng->reset();
  for (int i = 0; i < num_agents; i++)
    r->pids.push_back(r->eng->template add_player<agario::Player<false>>(
        "agent" + std::to_string(i)));
  // mode-0 roster: round-robin bot types (BaseEnvironment.hpp:374-399);
  // bot pids recorded after the agents (ref_bot_mass)
  for (int i = 0; i < num_bots; i++) {
    switch (i % 4) {
      case 0: r->pids.push_back(r->eng->template add_player<agario::bot::HungryBot<false>>("HungryBot")); break;
      case 1: r->pids.push_back(r->eng->template add_player<agario::bot::HungryShyBot<false>>("HungryShyBot")); break;
      case 2: r->pids.push_back(r->eng->template add_player<agario::bot::AggressiveBot<false>>("AggressiveBot")); break;
      case 3: r->pids.push_back(r->eng->template add_player<agario::bot::AggressiveShyBot<false>>("AggressiveShyBot")); break;
    }
  }
  // duel modes 7-10 add one specific bot (BaseEnvironment.hpp:401-425)
  if (mode >= 7 && mode <= 10) {
    switch (mode - 7) {
      case 0: r->pids.push_back(r->eng->template add_player<agario::bot::HungryBot<false>>("HungryBot")); break;
      case 1: r->pids.push_back(r->eng->template add_player<agario::bot::HungryShyBot<false>>("HungryShyBot")); break;
      case 2: r->pids.push_back(r->eng->template add_player<agario::bot::AggressiveBot<false>>("AggressiveBot")); break;
      case 3: r->pids.push_back(r->eng->template add_player<agario::bot::AggressiveShyBot<false>>("AggressiveShyBot")); break;
    }
  }
  return r;
}

void ref_destroy(void *h) { delete static_cast<RefEnv *>(h); }

// one env step: set the first agent's action, run `ticks` engine ticks of
// dt seconds (BaseEnvironment::step semantics, BaseEnvironment.hpp:89-122)
void ref_step(void *h, float dx, float dy, int act, int ticks, float dt) {
  auto *r = static_cast<RefEnv *>(h);
  auto &player = r->eng->player(r->pids[0]);
  // take_action: target = centroid + 10*(dx,dy) (BaseEnvironment.hpp:164-176)
  player.action = static_cast<agario::action>(act);
  float tx = player.x() + 10.0f * dx, ty = player.y() + 10.0f * dy;
  player.target = agario::Location(tx, ty);
  for (int t = 0; t < ticks; t++)
    r->eng->tick(std::chrono::duration<double>(dt));
}

// observables for drift statistics
double ref_agent_mass(void *h) {
  auto *r = static_cast<RefEnv *>(h);
  auto &p = r->eng->player(r->pids[0]);
  return p.dead() ? 0.0 : double(p.mass());
}
int ref_agent_cells(void *h) {
  auto *r = static_cast<RefEnv *>(h);
  return int(r->eng->player(r->pids[0]).cells.size());
}
double ref_bot_mass(void *h) {
  // first bot player (pids[num_agents]); 0.0 when dead or absent
  auto *r = static_cast<RefEnv *>(h);
  if (r->pids.size() < 2) return 0.0;
  auto &p = r->eng->player(r->pids[1]);
  return p.dead() ? 0.0 : double(p.mass());
}
int ref_pellets_alive(void *h) {
  return int(static_cast<RefEnv *>(h)->eng->pellet_count());
}
int ref_viruses_alive(void *h) {
  return int(static_cast<RefEnv *>(h)->eng->virus_count());
}
int ref_foods_alive(void *h) {
  return int(static_cast<RefEnv *>(h)->eng->food_count());
}
double ref_agent_x(void *h) {
  auto *r = static_cast<RefEnv *>(h);
  return double(r->eng->player(r->pids[0]).x());
}
double ref_agent_y(void *h) {
  auto *r = static_cast<RefEnv *>(h);
  return double(r->eng->player(r->pids[0]).y());
}
int ref_agent_food_eaten(void *h) {
  auto *r = static_cast<RefEnv *>(h);
  return int(r->eng->player(r->pids[0]).food_eaten);
}
// unit direction toward the nearest live pellet (for the greedy-chase
// drift policy; mirrors what our ram-obs policy computes)
void ref_nearest_pellet_dir(void *h, float *dx, float *dy) {
  auto *r = static_cast<RefEnv *>(h);
  auto &p = r->eng->player(r->pids[0]);
  *dx = 0; *dy = 0;
  if (p.dead()) return;
  float px = p.x(), py = p.y();
  float best = 1e30f;
  for (auto &pel : r->eng->pellets()) {
    float ddx = pel.x - px, ddy = pel.y - py;
    float d2 = ddx * ddx + ddy * ddy;
    if (d2 < best && d2 > 1e-4f) { best = d2; *dx = ddx; *dy = ddy; }
  }
  float n = std::sqrt((*dx) * (*dx) + (*dy) * (*dy));
  if (n > 1e-6f) { *dx /= n; *dy /= n; }
}

// unit direction toward the nearest virus (for the virus-feed drift
// policy that exercises the food->virus 7-hit reset/spawn path,
// Engine.hpp:661-687)
void ref_nearest_virus_dir(void *h, float *dx, float *dy) {
  auto *r = static_cast<RefEnv *>(h);
  auto &p = r->eng->player(r->pids[0]);
  *dx = 0; *dy = 0;
  if (p.dead()) return;
  float px = p.x(), py = p.y();
  float best = 1e30f;
  for (auto &v : r->eng->viruses()) {
    float ddx = v.x - px, ddy = v.y - py;
    float d2 = ddx * ddx + ddy * ddy;
    if (d2 < best) { best = d2; *dx = ddx; *dy = ddy; }
  }
  float n = std::sqrt((*dx) * (*dx) + (*dy) * (*dy));
  if (n > 1e-6f) { *dx /= n; *dy /= n; }
}

void ref_respawn_if_dead(void *h) {
  auto *r = static_cast<RefEnv *>(h);
  if (r->mode == 0) {
    // mode 0 respawns EVERY dead player each env step
    // (BaseEnvironment.hpp:99-101 repsawn_all_players)
    for (auto pid : r->pids) {
      auto &p = r->eng->player(pid);
      if (p.dead()) r->eng->respawn(p);
    }
    return;
  }
  auto &p = r->eng->player(r->pids[0]);
  if (p.dead()) r->eng->respawn(p);
}

}  // extern "C"
