// consistency_checker — forward/backward optical-flow cross-check CLI.
//
// Drop-in replacement for the reference binary
// (fast-artistic-videos/consistencyChecker/consistencyChecker.cpp): reads two
// Middlebury .flo files (the flow to check and its reverse), optionally the
// source frame (PPM) for a structure-tensor term, and writes an 8-bit PGM
// reliability map: 0 = occluded/inconsistent, 255 = reliable, motion
// boundaries = MOTION_BOUNDARY_VALUE (255 by default).
//
// This is a from-scratch implementation (flat row-major arrays, no tensor
// class library); the decision rules and filter numerics match the reference:
//   * round-trip check:  |x + f1(x) + f2(x+f1(x)) - x|^2
//                          >= 0.01*(|f1|^2 + |f2_w|^2) + structure + 0.5
//   * motion boundary:   |grad f1|^2 > 0.01*|f1|^2 + 0.002
//   * derivatives:       [-1/2, 0, 1/2], symmetric boundary
//   * structure tensor smoothing: exponential recursive Gaussian
//     (Alvarez–Mazorra), sigma = 3, same boundary initialization
//
// Divergence (deliberate): the reference writes an all-255 PGM before
// computing and then overwrites it, briefly exposing a bogus file to
// concurrent consumers; we write the output once, at the end.
//
// Usage: consistency_checker <flow1.flo> <flow2.flo> <out.pgm> [<frame.ppm>]

#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

namespace {

constexpr float kMotionBoundaryValue = 255.0f;
constexpr float kFloMagic = 202021.25f;

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<float> data;  // [((y * w) + x) * c + ch]
  float &at(int x, int y, int ch) { return data[(y * w + x) * c + ch]; }
  float at(int x, int y, int ch) const { return data[(y * w + x) * c + ch]; }
};

struct Plane {
  int w = 0, h = 0;
  std::vector<float> data;  // [y * w + x]
  Plane() = default;
  Plane(int w_, int h_, float fill = 0.f) : w(w_), h(h_), data(size_t(w_) * h_, fill) {}
  float &at(int x, int y) { return data[size_t(y) * w + x]; }
  float at(int x, int y) const { return data[size_t(y) * w + x]; }
};

[[noreturn]] void die(const std::string &msg) {
  std::fprintf(stderr, "consistency_checker: %s\n", msg.c_str());
  std::exit(1);
}

// ---------------------------------------------------------------------------
// I/O
// ---------------------------------------------------------------------------

Image read_flo(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) die(std::string("cannot open ") + path);
  float magic = 0;
  int32_t w = 0, h = 0;
  if (std::fread(&magic, 4, 1, f) != 1 || magic != kFloMagic)
    die(std::string("bad .flo magic in ") + path);
  if (std::fread(&w, 4, 1, f) != 1 || std::fread(&h, 4, 1, f) != 1 || w <= 0 || h <= 0)
    die(std::string("bad .flo header in ") + path);
  Image img;
  img.w = w; img.h = h; img.c = 2;
  img.data.resize(size_t(w) * h * 2);
  if (std::fread(img.data.data(), 4, img.data.size(), f) != img.data.size())
    die(std::string("truncated .flo ") + path);
  std::fclose(f);
  return img;
}

int pnm_token(FILE *f) {
  int ch;
  // skip whitespace and comments
  for (;;) {
    ch = std::getc(f);
    if (ch == '#') { while ((ch = std::getc(f)) != '\n' && ch != EOF) {} }
    else if (!std::isspace(ch)) break;
  }
  int value = 0;
  while (std::isdigit(ch)) { value = value * 10 + (ch - '0'); ch = std::getc(f); }
  return value;
}

Image read_ppm(const char *path) {
  FILE *f = std::fopen(path, "rb");
  if (!f) die(std::string("cannot open ") + path);
  int p = std::getc(f), kind = std::getc(f);
  if (p != 'P' || (kind != '5' && kind != '6')) die(std::string("not a binary PGM/PPM: ") + path);
  Image img;
  img.c = (kind == '6') ? 3 : 1;
  img.w = pnm_token(f);
  img.h = pnm_token(f);
  int maxval = pnm_token(f);
  if (maxval <= 0 || maxval > 255) die("only 8-bit netpbm supported");
  std::vector<uint8_t> raw(size_t(img.w) * img.h * img.c);
  if (std::fread(raw.data(), 1, raw.size(), f) != raw.size())
    die(std::string("truncated netpbm ") + path);
  std::fclose(f);
  img.data.assign(raw.begin(), raw.end());
  return img;
}

void write_pgm(const char *path, const Plane &p) {
  FILE *f = std::fopen(path, "wb");
  if (!f) die(std::string("cannot write ") + path);
  std::fprintf(f, "P5\n%d %d\n255\n", p.w, p.h);
  std::vector<uint8_t> raw(p.data.size());
  for (size_t i = 0; i < p.data.size(); ++i) {
    float v = p.data[i];
    if (v < 0.f) v = 0.f;
    if (v > 255.f) v = 255.f;
    raw[i] = uint8_t(v);
  }
  if (std::fwrite(raw.data(), 1, raw.size(), f) != raw.size()) die("short write");
  std::fclose(f);
}

// ---------------------------------------------------------------------------
// filters
// ---------------------------------------------------------------------------

// [-1/2, 0, 1/2] derivative with symmetric (half-sample) boundary.
Plane central_diff_x(const Plane &in) {
  Plane out(in.w, in.h);
  for (int y = 0; y < in.h; ++y)
    for (int x = 0; x < in.w; ++x) {
      int xl = x > 0 ? x - 1 : 0;                    // reflect: index -1 -> 0
      int xr = x < in.w - 1 ? x + 1 : in.w - 1;      // reflect: w -> w-1
      out.at(x, y) = 0.5f * (in.at(xr, y) - in.at(xl, y));
    }
  return out;
}

Plane central_diff_y(const Plane &in) {
  Plane out(in.w, in.h);
  for (int y = 0; y < in.h; ++y) {
    int yu = y > 0 ? y - 1 : 0;
    int yd = y < in.h - 1 ? y + 1 : in.h - 1;
    for (int x = 0; x < in.w; ++x)
      out.at(x, y) = 0.5f * (in.at(x, yd) - in.at(x, yu));
  }
  return out;
}

// Exponential recursive Gaussian approximation (Alvarez–Mazorra form), one
// 1-D pass. Coefficients and boundary start-up match the reference filter
// so outputs are bit-comparable.
void recursive_smooth_1d(float *v, int n, int stride, float sigma,
                         std::vector<float> &fwd, std::vector<float> &bwd) {
  const float alpha = 2.5f / (std::sqrt(float(M_PI)) * sigma);
  const float e = std::exp(-alpha);
  const float e2 = e * e;
  const float two_e = 2.0f * e;
  const float k = (1.0f - e) * (1.0f - e) / (1.0f + 2.0f * alpha * e - e2);
  const float pre_minus = e * (alpha - 1.0f);
  const float pre_plus = e * (alpha + 1.0f);
  auto x = [&](int i) -> float & { return v[size_t(i) * stride]; };

  fwd[0] = (0.5f - k * pre_minus) * x(0);
  fwd[1] = k * (x(1) + pre_minus * x(0)) + (two_e - e2) * fwd[0];
  for (int i = 2; i < n; ++i)
    fwd[i] = k * (x(i) + pre_minus * x(i - 1)) + two_e * fwd[i - 1] - e2 * fwd[i - 2];

  bwd[n - 1] = (0.5f + k * pre_minus) * x(n - 1);
  bwd[n - 2] = k * (pre_plus - e2) * x(n - 1) + (two_e - e2) * bwd[n - 1];
  for (int i = n - 3; i >= 0; --i)
    bwd[i] = k * (pre_plus * x(i + 1) - e2 * x(i + 2)) + two_e * bwd[i + 1] - e2 * bwd[i + 2];

  for (int i = 0; i < n; ++i) x(i) = fwd[i] + bwd[i];
}

void recursive_smooth(Plane &p, float sigma) {
  std::vector<float> fwd(std::max(p.w, p.h)), bwd(std::max(p.w, p.h));
  for (int y = 0; y < p.h; ++y) recursive_smooth_1d(&p.data[size_t(y) * p.w], p.w, 1, sigma, fwd, bwd);
  for (int x = 0; x < p.w; ++x) recursive_smooth_1d(&p.data[x], p.h, p.w, sigma, fwd, bwd);
}

// ---------------------------------------------------------------------------
// structure tensor (smallest eigenvalue), normalized to [0, 1]
// ---------------------------------------------------------------------------

Plane structure_smallest_ev(const Image &img, float rho) {
  Plane sxx(img.w, img.h), syy(img.w, img.h), sxy(img.w, img.h);
  for (int ch = 0; ch < img.c; ++ch) {
    Plane layer(img.w, img.h);
    for (int y = 0; y < img.h; ++y)
      for (int x = 0; x < img.w; ++x) layer.at(x, y) = img.at(x, y, ch);
    Plane dx = central_diff_x(layer);
    Plane dy = central_diff_y(layer);
    for (size_t i = 0; i < layer.data.size(); ++i) {
      sxx.data[i] += dx.data[i] * dx.data[i];
      syy.data[i] += dy.data[i] * dy.data[i];
      sxy.data[i] += dx.data[i] * dy.data[i];
    }
  }
  recursive_smooth(sxx, rho);
  recursive_smooth(syy, rho);
  recursive_smooth(sxy, rho);
  Plane ev(img.w, img.h);
  for (size_t i = 0; i < ev.data.size(); ++i) {
    float a = sxx.data[i], b = sxy.data[i], c = syy.data[i];
    float half_trace = 0.5f * (a + c);
    float disc = half_trace * half_trace + b * b - a * c;
    ev.data[i] = disc < 0.f ? 0.f : half_trace - std::sqrt(disc);
  }
  // min-max normalize to [0, 1]
  float lo = ev.data[0], hi = ev.data[0];
  for (float v : ev.data) { lo = std::min(lo, v); hi = std::max(hi, v); }
  float scale = (hi - lo) != 0.f ? 1.0f / (hi - lo) : 1.0f;
  for (float &v : ev.data) v = (v - lo) * scale;
  return ev;
}

// ---------------------------------------------------------------------------
// the check itself
// ---------------------------------------------------------------------------

Plane check_consistency(const Image &f1, const Image &f2, const Plane *structure) {
  const int w = f1.w, h = f1.h;
  Plane reliable(w, h, 255.0f);

  // motion-edge energy of f1: sum of squared central derivatives of (u, v)
  Plane u(w, h), v(w, h);
  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) { u.at(x, y) = f1.at(x, y, 0); v.at(x, y) = f1.at(x, y, 1); }
  Plane ux = central_diff_x(u), uy = central_diff_y(u);
  Plane vx = central_diff_x(v), vy = central_diff_y(v);

  float structure_avg = 0.f;
  if (structure) {
    for (float s : structure->data) structure_avg += s;
    structure_avg /= float(structure->data.size());
  }

  for (int y = 0; y < h; ++y)
    for (int x = 0; x < w; ++x) {
      const float fu = u.at(x, y), fv = v.at(x, y);
      const float bx = x + fu, by = y + fv;
      const int x1 = int(std::floor(bx)), y1 = int(std::floor(by));
      if (x1 < 0 || x1 + 1 >= w || y1 < 0 || y1 + 1 >= h) {
        reliable.at(x, y) = 0.f;
        continue;
      }
      const float ax = bx - x1, ay = by - y1;
      auto f2at = [&](int xx, int yy, int ch) { return f2.at(xx, yy, ch); };
      const float ru = (1 - ay) * ((1 - ax) * f2at(x1, y1, 0) + ax * f2at(x1 + 1, y1, 0)) +
                       ay * ((1 - ax) * f2at(x1, y1 + 1, 0) + ax * f2at(x1 + 1, y1 + 1, 0));
      const float rv = (1 - ay) * ((1 - ax) * f2at(x1, y1, 1) + ax * f2at(x1 + 1, y1, 1)) +
                       ay * ((1 - ax) * f2at(x1, y1 + 1, 1) + ax * f2at(x1 + 1, y1 + 1, 1));
      const float cx = bx + ru - x, cy = by + rv - y;

      float structure_term = 0.f;
      if (structure)
        structure_term = 4.0f / structure_avg *
                         std::max(0.0f, structure_avg / 2.0f - structure->at(x, y));

      if (cx * cx + cy * cy >=
          0.01f * (fu * fu + fv * fv + ru * ru + rv * rv) + structure_term + 0.5f) {
        reliable.at(x, y) = 0.f;
        continue;
      }
      const float edge = ux.at(x, y) * ux.at(x, y) + vx.at(x, y) * vx.at(x, y) +
                         uy.at(x, y) * uy.at(x, y) + vy.at(x, y) * vy.at(x, y);
      if (edge > 0.01f * (fu * fu + fv * fv) + 0.002f)
        reliable.at(x, y) = kMotionBoundaryValue;
    }
  return reliable;
}

}  // namespace

int main(int argc, char **argv) {
  if (argc < 4) {
    std::fprintf(stderr,
                 "usage: %s <flow1.flo> <flow2.flo> <out.pgm> [<frame.ppm>]\n", argv[0]);
    return 2;
  }
  Image f1 = read_flo(argv[1]);
  Image f2 = read_flo(argv[2]);
  if (f1.w != f2.w || f1.h != f2.h) die("flow size mismatch");

  Plane reliable;
  if (argc >= 5) {
    Image frame = read_ppm(argv[4]);
    if (frame.w != f1.w || frame.h != f1.h) die("frame/flow size mismatch");
    Plane structure = structure_smallest_ev(frame, 3.0f);
    reliable = check_consistency(f1, f2, &structure);
  } else {
    reliable = check_consistency(f1, f2, nullptr);
  }
  write_pgm(argv[3], reliable);
  return 0;
}
