// Minimal glm-compatible shim — JUST the subset the Pies reference uses —
// so the reference C++ can be compiled for baseline measurement in an
// environment whose glm submodule is an empty directory.  This is original
// code written against the documented glm API (column-major matrices,
// component-wise ops); it is a measurement aid, not part of the engine.
#pragma once

#include <cmath>

namespace glm {

struct vec3;

struct vec2 {
  float x = 0.0f, y = 0.0f;
  vec2() = default;
  explicit vec2(float s) : x(s), y(s) {}
  vec2(float x_, float y_) : x(x_), y(y_) {}
  inline vec2(const vec3& v);  // implicit truncation, like glm's default config
  float& operator[](int i) { return (&x)[i]; }
  const float& operator[](int i) const { return (&x)[i]; }
};

struct vec4;

struct vec3 {
  union { float x, r; };
  union { float y, g; };
  union { float z, b; };
  vec3() : x(0.0f), y(0.0f), z(0.0f) {}
  explicit vec3(float s) : x(s), y(s), z(s) {}
  vec3(float x_, float y_, float z_) : x(x_), y(y_), z(z_) {}
  inline explicit vec3(const vec4& v);
  float& operator[](int i) { return (&x)[i]; }
  const float& operator[](int i) const { return (&x)[i]; }
  vec3& operator+=(const vec3& o) { x += o.x; y += o.y; z += o.z; return *this; }
  vec3& operator-=(const vec3& o) { x -= o.x; y -= o.y; z -= o.z; return *this; }
  vec3& operator*=(float s) { x *= s; y *= s; z *= s; return *this; }
  vec3& operator/=(float s) { x /= s; y /= s; z /= s; return *this; }
};

struct vec4 {
  float x = 0.0f, y = 0.0f, z = 0.0f, w = 0.0f;
  vec4() = default;
  explicit vec4(float s) : x(s), y(s), z(s), w(s) {}
  vec4(float x_, float y_, float z_, float w_) : x(x_), y(y_), z(z_), w(w_) {}
  vec4(const vec3& v, float w_) : x(v.x), y(v.y), z(v.z), w(w_) {}
  float& operator[](int i) { return (&x)[i]; }
  const float& operator[](int i) const { return (&x)[i]; }
  vec4& operator+=(const vec4& o) { x += o.x; y += o.y; z += o.z; w += o.w; return *this; }
};

inline vec3::vec3(const vec4& v) : x(v.x), y(v.y), z(v.z) {}
inline vec2::vec2(const vec3& v) : x(v.x), y(v.y) {}

// ---- vec3 arithmetic ----
inline vec3 operator+(const vec3& a, const vec3& b) { return {a.x + b.x, a.y + b.y, a.z + b.z}; }
inline vec3 operator-(const vec3& a, const vec3& b) { return {a.x - b.x, a.y - b.y, a.z - b.z}; }
inline vec3 operator-(const vec3& a) { return {-a.x, -a.y, -a.z}; }
inline vec3 operator*(const vec3& a, const vec3& b) { return {a.x * b.x, a.y * b.y, a.z * b.z}; }
inline vec3 operator/(const vec3& a, const vec3& b) { return {a.x / b.x, a.y / b.y, a.z / b.z}; }
inline vec3 operator*(const vec3& a, float s) { return {a.x * s, a.y * s, a.z * s}; }
inline vec3 operator*(float s, const vec3& a) { return a * s; }
inline vec3 operator/(const vec3& a, float s) { return {a.x / s, a.y / s, a.z / s}; }
inline vec3 operator/(float s, const vec3& a) { return {s / a.x, s / a.y, s / a.z}; }
inline vec3 operator+(const vec3& a, float s) { return {a.x + s, a.y + s, a.z + s}; }
inline vec3 operator-(const vec3& a, float s) { return {a.x - s, a.y - s, a.z - s}; }
inline bool operator==(const vec3& a, const vec3& b) { return a.x == b.x && a.y == b.y && a.z == b.z; }
inline bool operator!=(const vec3& a, const vec3& b) { return !(a == b); }

// ---- vec4 arithmetic ----
inline vec4 operator+(const vec4& a, const vec4& b) { return {a.x + b.x, a.y + b.y, a.z + b.z, a.w + b.w}; }
inline vec4 operator-(const vec4& a, const vec4& b) { return {a.x - b.x, a.y - b.y, a.z - b.z, a.w - b.w}; }
inline vec4 operator*(const vec4& a, float s) { return {a.x * s, a.y * s, a.z * s, a.w * s}; }
inline vec4 operator*(float s, const vec4& a) { return a * s; }
inline vec4 operator/(const vec4& a, float s) { return {a.x / s, a.y / s, a.z / s, a.w / s}; }

// ---- vec2 arithmetic ----
inline vec2 operator+(const vec2& a, const vec2& b) { return {a.x + b.x, a.y + b.y}; }
inline vec2 operator-(const vec2& a, const vec2& b) { return {a.x - b.x, a.y - b.y}; }
inline vec2 operator*(const vec2& a, float s) { return {a.x * s, a.y * s}; }
inline vec2 operator*(float s, const vec2& a) { return a * s; }
inline vec2 operator/(const vec2& a, float s) { return {a.x / s, a.y / s}; }

// ---- column-major mat3 ----
struct mat3 {
  vec3 c[3];  // columns
  mat3() : mat3(1.0f) {}
  explicit mat3(float d) {
    c[0] = vec3(d, 0, 0); c[1] = vec3(0, d, 0); c[2] = vec3(0, 0, d);
  }
  mat3(const vec3& c0, const vec3& c1, const vec3& c2) { c[0] = c0; c[1] = c1; c[2] = c2; }
  // Column-major scalar constructor: (x0,y0,z0) is the first column.
  mat3(float x0, float y0, float z0, float x1, float y1, float z1,
       float x2, float y2, float z2) {
    c[0] = vec3(x0, y0, z0); c[1] = vec3(x1, y1, z1); c[2] = vec3(x2, y2, z2);
  }
  vec3& operator[](int i) { return c[i]; }
  const vec3& operator[](int i) const { return c[i]; }
  mat3& operator+=(const mat3& o) { c[0] += o.c[0]; c[1] += o.c[1]; c[2] += o.c[2]; return *this; }
};

inline mat3 operator+(const mat3& a, const mat3& b) { return {a.c[0] + b.c[0], a.c[1] + b.c[1], a.c[2] + b.c[2]}; }
inline mat3 operator*(const mat3& m, float s) { return {m.c[0] * s, m.c[1] * s, m.c[2] * s}; }
inline mat3 operator*(float s, const mat3& m) { return m * s; }
inline mat3 operator/(const mat3& m, float s) { return {m.c[0] / s, m.c[1] / s, m.c[2] / s}; }
inline vec3 operator*(const mat3& m, const vec3& v) {
  return m.c[0] * v.x + m.c[1] * v.y + m.c[2] * v.z;
}
inline mat3 operator*(const mat3& a, const mat3& b) {
  return {a * b.c[0], a * b.c[1], a * b.c[2]};
}

// ---- column-major mat4 ----
struct mat4 {
  vec4 c[4];
  mat4() : mat4(1.0f) {}
  explicit mat4(float d) {
    c[0] = vec4(d, 0, 0, 0); c[1] = vec4(0, d, 0, 0);
    c[2] = vec4(0, 0, d, 0); c[3] = vec4(0, 0, 0, d);
  }
  vec4& operator[](int i) { return c[i]; }
  const vec4& operator[](int i) const { return c[i]; }
};

inline vec4 operator*(const mat4& m, const vec4& v) {
  return m.c[0] * v.x + m.c[1] * v.y + m.c[2] * v.z + m.c[3] * v.w;
}
inline mat4 operator*(const mat4& a, const mat4& b) {
  mat4 r(0.0f);
  for (int i = 0; i < 4; ++i) r.c[i] = a * b.c[i];
  return r;
}

// ---- functions ----
inline float dot(const vec3& a, const vec3& b) { return a.x * b.x + a.y * b.y + a.z * b.z; }
inline float dot(const vec2& a, const vec2& b) { return a.x * b.x + a.y * b.y; }
inline vec3 cross(const vec3& a, const vec3& b) {
  return {a.y * b.z - a.z * b.y, a.z * b.x - a.x * b.z, a.x * b.y - a.y * b.x};
}
inline float length(const vec3& v) { return std::sqrt(dot(v, v)); }
inline float length(const vec2& v) { return std::sqrt(dot(v, v)); }
inline vec3 normalize(const vec3& v) { return v / length(v); }
inline float floor(float s) { return std::floor(s); }
inline float ceil(float s) { return std::ceil(s); }
inline float fract(float s) { return s - std::floor(s); }
inline vec3 floor(const vec3& v) { return {std::floor(v.x), std::floor(v.y), std::floor(v.z)}; }
inline vec3 ceil(const vec3& v) { return {std::ceil(v.x), std::ceil(v.y), std::ceil(v.z)}; }
inline vec3 fract(const vec3& v) { return v - floor(v); }
inline float min(float a, float b) { return a < b ? a : b; }
inline float max(float a, float b) { return a > b ? a : b; }
inline vec3 min(const vec3& a, const vec3& b) { return {min(a.x, b.x), min(a.y, b.y), min(a.z, b.z)}; }
inline vec3 max(const vec3& a, const vec3& b) { return {max(a.x, b.x), max(a.y, b.y), max(a.z, b.z)}; }
inline float clamp(float v, float lo, float hi) { return v < lo ? lo : (v > hi ? hi : v); }
inline vec3 clamp(const vec3& v, float lo, float hi) {
  return {clamp(v.x, lo, hi), clamp(v.y, lo, hi), clamp(v.z, lo, hi)};
}
inline vec3 clamp(const vec3& v, const vec3& lo, const vec3& hi) {
  return {clamp(v.x, lo.x, hi.x), clamp(v.y, lo.y, hi.y), clamp(v.z, lo.z, hi.z)};
}
inline float mix(float a, float b, float t) { return a + t * (b - a); }
inline vec3 mix(const vec3& a, const vec3& b, float t) { return a + (b - a) * t; }
inline float abs(float v) { return std::fabs(v); }
inline vec3 abs(const vec3& v) { return {std::fabs(v.x), std::fabs(v.y), std::fabs(v.z)}; }

inline mat3 transpose(const mat3& m) {
  return {vec3(m[0].x, m[1].x, m[2].x), vec3(m[0].y, m[1].y, m[2].y),
          vec3(m[0].z, m[1].z, m[2].z)};
}
inline float determinant(const mat3& m) { return dot(m.c[0], cross(m.c[1], m.c[2])); }
// glm::outerProduct(c, r) = c * r^T, column j = c * r[j].
inline mat3 outerProduct(const vec3& c, const vec3& r) {
  return {c * r.x, c * r.y, c * r.z};
}
inline mat3 inverse(const mat3& m) {
  const vec3 r0 = cross(m.c[1], m.c[2]);
  const vec3 r1 = cross(m.c[2], m.c[0]);
  const vec3 r2 = cross(m.c[0], m.c[1]);
  const float inv_det = 1.0f / dot(m.c[0], r0);
  // rows of the inverse are the scaled cross products -> build columns.
  return transpose(mat3(r0 * inv_det, r1 * inv_det, r2 * inv_det));
}
inline mat4 inverse(const mat4& m) {
  // General 4x4 inverse via cofactor expansion (column-major).
  const float* a = &m.c[0].x;
  float inv[16];
  inv[0] = a[5]*a[10]*a[15] - a[5]*a[11]*a[14] - a[9]*a[6]*a[15] + a[9]*a[7]*a[14] + a[13]*a[6]*a[11] - a[13]*a[7]*a[10];
  inv[4] = -a[4]*a[10]*a[15] + a[4]*a[11]*a[14] + a[8]*a[6]*a[15] - a[8]*a[7]*a[14] - a[12]*a[6]*a[11] + a[12]*a[7]*a[10];
  inv[8] = a[4]*a[9]*a[15] - a[4]*a[11]*a[13] - a[8]*a[5]*a[15] + a[8]*a[7]*a[13] + a[12]*a[5]*a[11] - a[12]*a[7]*a[9];
  inv[12] = -a[4]*a[9]*a[14] + a[4]*a[10]*a[13] + a[8]*a[5]*a[14] - a[8]*a[6]*a[13] - a[12]*a[5]*a[10] + a[12]*a[6]*a[9];
  inv[1] = -a[1]*a[10]*a[15] + a[1]*a[11]*a[14] + a[9]*a[2]*a[15] - a[9]*a[3]*a[14] - a[13]*a[2]*a[11] + a[13]*a[3]*a[10];
  inv[5] = a[0]*a[10]*a[15] - a[0]*a[11]*a[14] - a[8]*a[2]*a[15] + a[8]*a[3]*a[14] + a[12]*a[2]*a[11] - a[12]*a[3]*a[10];
  inv[9] = -a[0]*a[9]*a[15] + a[0]*a[11]*a[13] + a[8]*a[1]*a[15] - a[8]*a[3]*a[13] - a[12]*a[1]*a[11] + a[12]*a[3]*a[9];
  inv[13] = a[0]*a[9]*a[14] - a[0]*a[10]*a[13] - a[8]*a[1]*a[14] + a[8]*a[2]*a[13] + a[12]*a[1]*a[10] - a[12]*a[2]*a[9];
  inv[2] = a[1]*a[6]*a[15] - a[1]*a[7]*a[14] - a[5]*a[2]*a[15] + a[5]*a[3]*a[14] + a[13]*a[2]*a[7] - a[13]*a[3]*a[6];
  inv[6] = -a[0]*a[6]*a[15] + a[0]*a[7]*a[14] + a[4]*a[2]*a[15] - a[4]*a[3]*a[14] - a[12]*a[2]*a[7] + a[12]*a[3]*a[6];
  inv[10] = a[0]*a[5]*a[15] - a[0]*a[7]*a[13] - a[4]*a[1]*a[15] + a[4]*a[3]*a[13] + a[12]*a[1]*a[7] - a[12]*a[3]*a[5];
  inv[14] = -a[0]*a[5]*a[14] + a[0]*a[6]*a[13] + a[4]*a[1]*a[14] - a[4]*a[2]*a[13] - a[12]*a[1]*a[6] + a[12]*a[2]*a[5];
  inv[3] = -a[1]*a[6]*a[11] + a[1]*a[7]*a[10] + a[5]*a[2]*a[11] - a[5]*a[3]*a[10] - a[9]*a[2]*a[7] + a[9]*a[3]*a[6];
  inv[7] = a[0]*a[6]*a[11] - a[0]*a[7]*a[10] - a[4]*a[2]*a[11] + a[4]*a[3]*a[10] + a[8]*a[2]*a[7] - a[8]*a[3]*a[6];
  inv[11] = -a[0]*a[5]*a[11] + a[0]*a[7]*a[9] + a[4]*a[1]*a[11] - a[4]*a[3]*a[9] - a[8]*a[1]*a[7] + a[8]*a[3]*a[5];
  inv[15] = a[0]*a[5]*a[10] - a[0]*a[6]*a[9] - a[4]*a[1]*a[10] + a[4]*a[2]*a[9] + a[8]*a[1]*a[6] - a[8]*a[2]*a[5];
  float det = a[0]*inv[0] + a[1]*inv[4] + a[2]*inv[8] + a[3]*inv[12];
  mat4 r(0.0f);
  float* out = &r.c[0].x;
  const float inv_det = 1.0f / det;
  for (int i = 0; i < 16; ++i) out[i] = inv[i] * inv_det;
  return r;
}

}  // namespace glm
