// Baseline measurement harness for the reference Pies engine.
//
// Compiles the UNMODIFIED reference sources (/root/reference/Src) against
// shim headers for its empty Extern/ submodules (glm / parallel-hashmap /
// tetgen; Eigen comes from tensorflow's bundled copy) and times
// Pies::Solver::tick on the benchmark scenes defined in BASELINE.json:
//
//   tet_soup <n_tets>  — N independent tetrahedra on a jittered grid in
//                        floor contact; strain + volume constraint per tet,
//                        all 4 faces as collision triangles.  Mirrors
//                        pies_tpu.SceneBuilder.create_tet_soup(spacing=1.6,
//                        scale=0.8, w=2000, height=0.5, jitter=0.05).
//   rope <n_nodes>     — PBD chain with distance constraints + pinned start.
//
// The Solver's node/constraint vectors are private and its only tet-body
// entry point requires tetgen, so this harness (and only this harness)
// compiles with private access to populate the exact soup scene; it calls
// nothing but public API afterwards.  This file is a measurement aid, not
// engine code.  Std/Eigen headers are pre-included so the access-specifier
// redefinition below only affects the Pies headers.
#include <Eigen/Core>
#include <Eigen/Dense>
#include <Eigen/Geometry>
#include <Eigen/SVD>
#include <Eigen/Sparse>
#include <Eigen/SparseCholesky>
#include <unsupported/Eigen/Polynomials>

#include <algorithm>
#include <array>
#include <cmath>
#include <functional>
#include <memory>
#include <optional>
#include <sstream>
#include <thread>
#include <utility>
#include <vector>

#define private public
#include <Pies/Solver.h>
#undef private

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <random>
#include <string>

using namespace Pies;

static void addTetSoup(Solver& solver, int count) {
  // Mirrors SceneBuilder.create_tet_soup(count, spacing=1.6, scale=0.8,
  // w=2000, mass=1, jitter=0.05, height=0.5).
  const float spacing = 1.6f, scale = 0.8f, w = 2000.0f, height = 0.5f,
              jitter = 0.05f;
  const int side = static_cast<int>(std::ceil(std::cbrt(double(count))));
  std::mt19937 rng(0);
  std::normal_distribution<float> normal(0.0f, 1.0f);

  const glm::vec3 unit[4] = {
      {0, 0, 0}, {scale, 0, 0}, {0, scale, 0}, {0, 0, scale}};
  const int faces[4][3] = {{0, 2, 1}, {0, 1, 3}, {0, 3, 2}, {1, 2, 3}};

  solver._nodes.reserve(4 * size_t(count));
  solver._tets.reserve(count);
  solver._tetConstraints.reserve(count);
  solver._volumeConstraints.reserve(count);
  solver._triangles.reserve(4 * size_t(count));

  int emitted = 0;
  for (int i = 0; i < side && emitted < count; ++i)
    for (int j = 0; j < side && emitted < count; ++j)
      for (int k = 0; k < side && emitted < count; ++k, ++emitted) {
        glm::vec3 origin(i * spacing + jitter * normal(rng),
                         j * spacing + height + jitter * normal(rng),
                         k * spacing + jitter * normal(rng));
        uint32_t base = uint32_t(solver._nodes.size());
        for (int c = 0; c < 4; ++c) {
          Node& node = solver._nodes.emplace_back();
          node.id = base + c;
          node.position = origin + unit[c];
          node.prevPosition = node.position;
          node.velocity = glm::vec3(0.0f);
          node.radius = 0.4f * scale;
          node.invMass = 1.0f;
        }
        Tetrahedron& tet = solver._tets.emplace_back();
        tet.nodeIds[0] = base;
        tet.nodeIds[1] = base + 1;
        tet.nodeIds[2] = base + 2;
        tet.nodeIds[3] = base + 3;
        solver._tetConstraints.push_back(createTetrahedralConstraint(
            solver._constraintId++, w, solver._nodes[base],
            solver._nodes[base + 1], solver._nodes[base + 2],
            solver._nodes[base + 3], 0.8f, 1.0f));
        solver._volumeConstraints.push_back(createVolumeConstraint(
            solver._constraintId++, w, solver._nodes[base],
            solver._nodes[base + 1], solver._nodes[base + 2],
            solver._nodes[base + 3], 1.0f, 1.0f));
        for (auto& f : faces) {
          Triangle& tri = solver._triangles.emplace_back();
          tri.nodeIds[0] = base + f[0];
          tri.nodeIds[1] = base + f[1];
          tri.nodeIds[2] = base + f[2];
        }
      }
  solver._vertices.resize(solver._nodes.size());
  for (size_t i = 0; i < solver._nodes.size(); ++i) {
    solver._vertices[i].position = solver._nodes[i].position;
    solver._vertices[i].radius = solver._nodes[i].radius;
  }
  solver.renderStateDirty = true;
}

static void addRope(Solver& solver, int n) {
  // Mirrors bench_all config 1: a fleet of pinned 128-node ropes (n total
  // particles).  PBD applies position += w * (projected - position)
  // (Constraints.h:127), so w is a blend factor <= 1; the radius stays
  // below half the segment spacing so chain neighbors don't start inside
  // the node-node response.  The rebuild's chain scan reproduces this
  // sequential projection exactly, so both engines run the same depth.
  const float w = 0.9f;
  const int per = 128;
  const int ropes = n / per;
  const float spacing = 12.0f / float(per - 1);
  const float radius = std::min(0.25f, 0.4f * spacing);
  for (int r = 0; r < ropes; ++r) {
    const glm::vec3 start(0.5f * float(r % 4), 8.0f, 0.7f * float(r / 4));
    const glm::vec3 end = start + glm::vec3(12.0f, 0.0f, 0.0f);
    const int base = r * per;
    for (int i = 0; i < per; ++i) {
      float t = float(i) / float(per - 1);
      Node& node = solver._nodes.emplace_back();
      node.id = uint32_t(base + i);
      node.position = glm::mix(start, end, t);
      node.prevPosition = node.position;
      node.velocity = glm::vec3(0.0f);
      node.radius = radius;
      node.invMass = 1.0f;
    }
    for (int i = 1; i < per; ++i)
      solver._distanceConstraints.push_back(createDistanceConstraint(
          solver._constraintId++, solver._nodes[base + i],
          solver._nodes[base + i - 1], w));
    solver._positionConstraints.push_back(createPositionConstraint(
        solver._constraintId++, solver._nodes[base], w));
  }
  solver._vertices.resize(solver._nodes.size());
}

static void addMixedCloth(Solver& solver, int nTets) {
  // Mirrors bench_all config 4c (mixed_cloth_over_soup): the tet soup plus
  // an unpinned distance-constrained cloth sheet dropped onto it.  Mixed
  // scenes exercise the reference's single universal triangle sweep
  // (Solver.cpp:680-875) with no uniform body structure.
  addTetSoup(solver, nTets);
  const int sheetN = 48;
  const int side = static_cast<int>(std::ceil(std::cbrt(double(nTets) * 1.6 * 1.6 * 1.6)));
  const float lo = -0.4f * float(side), hi = 0.4f * float(side);
  const uint32_t base = uint32_t(solver._nodes.size());
  for (int i = 0; i < sheetN; ++i)
    for (int j = 0; j < sheetN; ++j) {
      float x = lo + (hi - lo) * float(i) / float(sheetN - 1);
      float z = lo + (hi - lo) * float(j) / float(sheetN - 1);
      Node& node = solver._nodes.emplace_back();
      node.id = base + uint32_t(i * sheetN + j);
      node.position = glm::vec3(x, 3.2f, z);
      node.prevPosition = node.position;
      node.velocity = glm::vec3(0.0f);
      node.radius = 0.25f;
      node.invMass = 1.0f;
    }
  auto id = [&](int i, int j) { return base + uint32_t(i * sheetN + j); };
  const float w = 4000.0f;
  for (int i = 0; i + 1 < sheetN; ++i)
    for (int j = 0; j < sheetN; ++j)
      solver._distanceConstraints.push_back(createDistanceConstraint(
          solver._constraintId++, solver._nodes[id(i, j)],
          solver._nodes[id(i + 1, j)], w));
  for (int i = 0; i < sheetN; ++i)
    for (int j = 0; j + 1 < sheetN; ++j)
      solver._distanceConstraints.push_back(createDistanceConstraint(
          solver._constraintId++, solver._nodes[id(i, j)],
          solver._nodes[id(i, j + 1)], w));
  for (int i = 0; i + 1 < sheetN; ++i)
    for (int j = 0; j + 1 < sheetN; ++j)
      solver._distanceConstraints.push_back(createDistanceConstraint(
          solver._constraintId++, solver._nodes[id(i, j)],
          solver._nodes[id(i + 1, j + 1)], w));
  for (int i = 0; i + 1 < sheetN; ++i)
    for (int j = 0; j + 1 < sheetN; ++j) {
      Triangle& t1 = solver._triangles.emplace_back();
      t1.nodeIds[0] = id(i, j);
      t1.nodeIds[1] = id(i + 1, j);
      t1.nodeIds[2] = id(i + 1, j + 1);
      Triangle& t2 = solver._triangles.emplace_back();
      t2.nodeIds[0] = id(i, j);
      t2.nodeIds[1] = id(i + 1, j + 1);
      t2.nodeIds[2] = id(i, j + 1);
    }
  solver._vertices.resize(solver._nodes.size());
  solver.renderStateDirty = true;
}

static bool addMeshScene(Solver& solver, const char* path) {
  // Mirrors bench_all config 3 (tet_cube_drop): a tet mesh dumped by
  // scripts/dump_mesh.py (same points/tets/surface the TPU bench uses, so
  // both engines integrate the identical scene).  Format: "nn nt ns",
  // nn "x y z" lines, nt "a b c d" lines, ns "a b c" lines.
  FILE* f = std::fopen(path, "r");
  if (!f) return false;
  int nn = 0, nt = 0, ns = 0;
  if (std::fscanf(f, "%d %d %d", &nn, &nt, &ns) != 3) {
    std::fclose(f);
    return false;
  }
  for (int i = 0; i < nn; ++i) {
    float x, y, z;
    if (std::fscanf(f, "%f %f %f", &x, &y, &z) != 3) break;
    Node& node = solver._nodes.emplace_back();
    node.id = uint32_t(i);
    node.position = glm::vec3(x, y, z);
    node.prevPosition = node.position;
    node.velocity = glm::vec3(0.0f);
    node.radius = 0.2f;
    node.invMass = 1.0f;
  }
  const float w = 1000.0f;
  for (int i = 0; i < nt; ++i) {
    int a, b, c, d;
    if (std::fscanf(f, "%d %d %d %d", &a, &b, &c, &d) != 4) break;
    Tetrahedron& tet = solver._tets.emplace_back();
    tet.nodeIds[0] = uint32_t(a);
    tet.nodeIds[1] = uint32_t(b);
    tet.nodeIds[2] = uint32_t(c);
    tet.nodeIds[3] = uint32_t(d);
    solver._tetConstraints.push_back(createTetrahedralConstraint(
        solver._constraintId++, w, solver._nodes[a], solver._nodes[b],
        solver._nodes[c], solver._nodes[d], 0.8f, 1.0f));
    solver._volumeConstraints.push_back(createVolumeConstraint(
        solver._constraintId++, w, solver._nodes[a], solver._nodes[b],
        solver._nodes[c], solver._nodes[d], 1.0f, 1.0f));
  }
  for (int i = 0; i < ns; ++i) {
    int a, b, c;
    if (std::fscanf(f, "%d %d %d", &a, &b, &c) != 3) break;
    Triangle& tri = solver._triangles.emplace_back();
    tri.nodeIds[0] = uint32_t(a);
    tri.nodeIds[1] = uint32_t(b);
    tri.nodeIds[2] = uint32_t(c);
  }
  std::fclose(f);
  solver._vertices.resize(solver._nodes.size());
  solver.renderStateDirty = true;
  return true;
}

int main(int argc, char** argv) {
  std::string scene = argc > 1 ? argv[1] : "tet_soup";
  int n = argc > 2 ? std::atoi(argv[2]) : 125000;
  int warmup = argc > 3 ? std::atoi(argv[3]) : 2;
  int ticks = argc > 4 ? std::atoi(argv[4]) : 10;

  SolverOptions options{};  // reference defaults (Solver.h:23-38)
  if (scene == "rope") options.solver = SolverName::PBD;
  Solver solver(options);

  int particles = 0;
  if (scene == "tet_soup") {
    addTetSoup(solver, n);
    particles = 4 * n;
  } else if (scene == "rope") {
    addRope(solver, n);
    particles = n;
  } else if (scene == "cloth") {
    // bench_all config 2: the reference's own createSheet (public API).
    solver.createSheet(glm::vec3(0.0f, 10.0f, 0.0f), 1.0f, 1.0f, 5000.0f);
    particles = int(solver._nodes.size());
  } else if (scene == "blobs") {
    // bench_all config 4a: 64 shape-matching 5x5x5 boxes (public API).
    int nb = n > 0 ? n : 64;
    int side = int(std::ceil(std::sqrt(float(nb))));
    for (int b = 0; b < nb; ++b) {
      int i = b / side, j = b % side;
      solver.createShapeMatchingBox(
          glm::vec3(3.0f * i, 1.0f + 0.5f * (b % 3), 3.0f * j), 5, 5, 5,
          1.0f, glm::vec3(0.0f), 4000.0f);
    }
    particles = int(solver._nodes.size());
  } else if (scene == "pile") {
    // bench_all config 4b: PBD node pile (node-node broadphase).
    options.solver = SolverName::PBD;
    solver = Solver(options);
    std::srand(3);
    for (int i = 0; i < n; ++i) {
      Node& node = solver._nodes.emplace_back();
      node.id = uint32_t(i);
      auto u = [] { return float(std::rand()) / float(RAND_MAX); };
      node.position = glm::vec3(-4.0f + 8.0f * u(), 0.5f + 5.5f * u(),
                                -4.0f + 8.0f * u());
      node.prevPosition = node.position;
      node.velocity = glm::vec3(0.0f);
      node.radius = 0.5f;
      node.invMass = 1.0f;
    }
    solver._vertices.resize(solver._nodes.size());
    particles = n;
  } else if (scene == "mixed") {
    addMixedCloth(solver, n > 0 ? n : 12500);
    particles = int(solver._nodes.size());
  } else if (scene == "mesh") {
    const char* path = std::getenv("PIES_MESH");
    if (!addMeshScene(solver, path ? path : "tet_cube_mesh.txt")) {
      std::fprintf(stderr, "mesh scene: cannot read mesh file\n");
      return 1;
    }
    particles = int(solver._nodes.size());
  } else {
    std::fprintf(stderr, "unknown scene %s\n", scene.c_str());
    return 1;
  }

  for (int i = 0; i < warmup; ++i) solver.tick(0.012f);

  auto t0 = std::chrono::steady_clock::now();
  for (int i = 0; i < ticks; ++i) solver.tick(0.012f);
  auto t1 = std::chrono::steady_clock::now();
  double elapsed = std::chrono::duration<double>(t1 - t0).count();

  double steps_per_sec = ticks / elapsed;
  double particle_iters =
      steps_per_sec * double(particles) *
      double(options.iterations) * double(options.timeSubsteps);
  std::printf(
      "{\"scene\": \"%s\", \"particles\": %d, \"ticks\": %d, "
      "\"steps_per_sec\": %.6g, \"tick_ms\": %.6g, "
      "\"particle_iters_per_sec\": %.6g, \"sim_failed\": %s}\n",
      scene.c_str(), particles, ticks, steps_per_sec,
      1000.0 * elapsed / ticks, particle_iters,
      solver._simFailed ? "true" : "false");
  return 0;
}
