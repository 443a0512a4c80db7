// Batched ORCA (Optimal Reciprocal Collision Avoidance) — native runtime.
//
// Reference parity: the reference repo's only native component is the
// external C++ RVO2 library driving its crowd (SURVEY.md §2.5). This is an
// independent implementation of the published ORCA algorithm (van den Berg,
// Guy, Lin, Manocha, ISRR 2009) re-architected for the TPU framework's
// host-side needs: one C call advances ALL agents of ALL envs in a batch
// (cache-friendly SoA-ish loops, OpenMP over envs when available), exposed
// through a plain C ABI for ctypes.
//
// Crowds per env are small (≤ tens), so neighbor search is the direct O(n)
// scan per agent inside the neighbor_dist cutoff — a kd-tree would lose to
// its own build cost at this size.

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

#ifdef _OPENMP
#include <omp.h>
#endif

namespace {

constexpr float kEps = 1e-5f;

struct Vec2 {
  float x = 0.f, y = 0.f;
};

inline Vec2 operator+(Vec2 a, Vec2 b) { return {a.x + b.x, a.y + b.y}; }
inline Vec2 operator-(Vec2 a, Vec2 b) { return {a.x - b.x, a.y - b.y}; }
inline Vec2 operator*(float s, Vec2 a) { return {s * a.x, s * a.y}; }
inline float dot(Vec2 a, Vec2 b) { return a.x * b.x + a.y * b.y; }
inline float det(Vec2 a, Vec2 b) { return a.x * b.y - a.y * b.x; }
inline float norm_sq(Vec2 a) { return dot(a, a); }
inline float norm(Vec2 a) { return std::sqrt(norm_sq(a)); }
inline Vec2 normalized(Vec2 a) {
  float n = norm(a);
  return n > 1e-12f ? Vec2{a.x / n, a.y / n} : Vec2{0.f, 0.f};
}

struct Line {
  Vec2 point;
  Vec2 direction;
};

// 1-D LP along line `no` clipped by the speed disc and lines < no.
bool linear_program1(const std::vector<Line>& lines, int no, float radius,
                     Vec2 opt, bool dir_opt, Vec2* result) {
  const Line& ln = lines[no];
  float dp = dot(ln.point, ln.direction);
  float disc = dp * dp + radius * radius - norm_sq(ln.point);
  if (disc < 0.f) return false;
  float sq = std::sqrt(disc);
  float t_left = -dp - sq, t_right = -dp + sq;
  for (int i = 0; i < no; ++i) {
    float den = det(ln.direction, lines[i].direction);
    float num = det(lines[i].direction, ln.point - lines[i].point);
    if (std::fabs(den) <= kEps) {
      if (num < 0.f) return false;
      continue;
    }
    float t = num / den;
    if (den >= 0.f)
      t_right = std::min(t_right, t);
    else
      t_left = std::max(t_left, t);
    if (t_left > t_right) return false;
  }
  float t;
  if (dir_opt)
    t = dot(opt, ln.direction) > 0.f ? t_right : t_left;
  else
    t = std::min(std::max(dot(ln.direction, opt - ln.point), t_left), t_right);
  *result = ln.point + t * ln.direction;
  return true;
}

// Incremental 2-D LP; returns the first failing line index (lines.size() on
// success).
size_t linear_program2(const std::vector<Line>& lines, float radius, Vec2 opt,
                       bool dir_opt, Vec2* result) {
  if (dir_opt) {
    *result = radius * opt;
  } else if (norm_sq(opt) > radius * radius) {
    *result = radius * normalized(opt);
  } else {
    *result = opt;
  }
  for (size_t i = 0; i < lines.size(); ++i) {
    if (det(lines[i].direction, lines[i].point - *result) > 0.f) {
      Vec2 temp = *result;
      if (!linear_program1(lines, static_cast<int>(i), radius, opt, dir_opt,
                           result)) {
        *result = temp;
        return i;
      }
    }
  }
  return lines.size();
}

// Infeasible fallback: minimize the maximum penetration.
void linear_program3(const std::vector<Line>& lines, size_t begin,
                     float radius, Vec2* result) {
  float distance = 0.f;
  for (size_t i = begin; i < lines.size(); ++i) {
    if (det(lines[i].direction, lines[i].point - *result) > distance) {
      std::vector<Line> proj;
      proj.reserve(i);
      for (size_t j = 0; j < i; ++j) {
        float d = det(lines[i].direction, lines[j].direction);
        Line ln;
        if (std::fabs(d) <= kEps) {
          if (dot(lines[i].direction, lines[j].direction) > 0.f) continue;
          ln.point = 0.5f * (lines[i].point + lines[j].point);
        } else {
          float t =
              det(lines[j].direction, lines[i].point - lines[j].point) / d;
          ln.point = lines[i].point + t * lines[i].direction;
        }
        ln.direction = normalized(lines[j].direction - lines[i].direction);
        proj.push_back(ln);
      }
      Vec2 temp = *result;
      Vec2 opt{-lines[i].direction.y, lines[i].direction.x};
      if (linear_program2(proj, radius, opt, /*dir_opt=*/true, result) <
          proj.size()) {
        *result = temp;
      }
      distance = det(lines[i].direction, lines[i].point - *result);
    }
  }
}

Vec2 orca_agent(int i, const Vec2* pos, const Vec2* vel, const float* rad,
                const uint8_t* active, int n, Vec2 pref, float max_speed,
                float neighbor_dist, float time_horizon, float dt,
                float safety) {
  std::vector<Line> lines;
  lines.reserve(n - 1);
  const float inv_th = 1.f / time_horizon, inv_dt = 1.f / dt;
  const float nd_sq = neighbor_dist * neighbor_dist;
  for (int j = 0; j < n; ++j) {
    if (j == i || !active[j]) continue;
    Vec2 rel_pos = pos[j] - pos[i];
    if (norm_sq(rel_pos) >= nd_sq) continue;
    Vec2 rel_vel = vel[i] - vel[j];
    float dist_sq = norm_sq(rel_pos);
    float comb_r = rad[i] + rad[j] + 2.f * safety;
    float comb_r_sq = comb_r * comb_r;
    Line line;
    Vec2 u;
    if (dist_sq > comb_r_sq) {
      Vec2 w = rel_vel - inv_th * rel_pos;
      float w_len_sq = norm_sq(w);
      float dp1 = dot(w, rel_pos);
      if (dp1 < 0.f && dp1 * dp1 > comb_r_sq * w_len_sq) {
        float w_len = std::sqrt(w_len_sq);
        Vec2 uw = {w.x / w_len, w.y / w_len};
        line.direction = {uw.y, -uw.x};
        u = (comb_r * inv_th - w_len) * uw;
      } else {
        float leg = std::sqrt(dist_sq - comb_r_sq);
        if (det(rel_pos, w) > 0.f) {
          line.direction = (1.f / dist_sq) *
                           Vec2{rel_pos.x * leg - rel_pos.y * comb_r,
                                rel_pos.x * comb_r + rel_pos.y * leg};
        } else {
          line.direction = (-1.f / dist_sq) *
                           Vec2{rel_pos.x * leg + rel_pos.y * comb_r,
                                -rel_pos.x * comb_r + rel_pos.y * leg};
        }
        float dp2 = dot(rel_vel, line.direction);
        u = dp2 * line.direction - rel_vel;
      }
    } else {
      Vec2 w = rel_vel - inv_dt * rel_pos;
      float w_len = norm(w);
      Vec2 uw = w_len > 1e-12f ? Vec2{w.x / w_len, w.y / w_len} : Vec2{1.f, 0.f};
      line.direction = {uw.y, -uw.x};
      u = (comb_r * inv_dt - w_len) * uw;
    }
    line.point = vel[i] + 0.5f * u;
    lines.push_back(line);
  }
  Vec2 result;
  size_t fail = linear_program2(lines, max_speed, pref, false, &result);
  if (fail < lines.size()) {
    linear_program3(lines, fail, max_speed, &result);
  }
  return result;
}

}  // namespace

extern "C" {

// One synchronous ORCA update for `batch` independent envs of `n` agents.
// Layout: positions/velocities/pref_vels [batch, n, 2] row-major float32;
// radii/max_speeds [batch, n]; active [batch, n] uint8.
void orca_step_batch(const float* positions, const float* velocities,
                     const float* radii, const float* pref_vels,
                     const float* max_speeds, const uint8_t* active,
                     int batch, int n, float neighbor_dist,
                     float time_horizon, float time_step, float safety_space,
                     float* out_velocities) {
#ifdef _OPENMP
#pragma omp parallel for schedule(static)
#endif
  for (int b = 0; b < batch; ++b) {
    const Vec2* pos = reinterpret_cast<const Vec2*>(positions + 2 * b * n);
    const Vec2* vel = reinterpret_cast<const Vec2*>(velocities + 2 * b * n);
    const Vec2* pref = reinterpret_cast<const Vec2*>(pref_vels + 2 * b * n);
    const float* rad = radii + b * n;
    const float* vmax = max_speeds + b * n;
    const uint8_t* act = active + b * n;
    Vec2* out = reinterpret_cast<Vec2*>(out_velocities + 2 * b * n);
    for (int i = 0; i < n; ++i) {
      if (!act[i]) {
        out[i] = {0.f, 0.f};
        continue;
      }
      out[i] = orca_agent(i, pos, vel, rad, act, n, pref[i], vmax[i],
                          neighbor_dist, time_horizon, time_step,
                          safety_space);
    }
  }
}

int orca_version() { return 1; }

}  // extern "C"
