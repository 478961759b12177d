#!/bin/sh
# Build the reference Pies engine (unmodified sources at /root/reference)
# against the shim headers + tensorflow's bundled Eigen, plus the timing
# harness.  Outputs ./refbench.
set -e
cd "$(dirname "$0")"

REF=${PIES_REFERENCE:-/root/reference}
EIGEN=$(python -c "import tensorflow, os; print(os.path.join(os.path.dirname(tensorflow.__file__), 'include'))" 2>/dev/null \
  || echo /opt/venv/lib/python3.12/site-packages/tensorflow/include)

# -mno-avx512fp16: Eigen's AVX512 FP16 kernels don't compile under this gcc
g++ -O3 -march=native -mno-avx512fp16 -std=c++17 -pthread \
  -I "$REF/Include" -I "$REF/Include/Pies" -I shims -I "$EIGEN" \
  -o refbench \
  refbench.cpp \
  "$REF"/Src/Solver.cpp \
  "$REF"/Src/Constraints.cpp \
  "$REF"/Src/ShapeMatchingConstraint.cpp \
  "$REF"/Src/CollisionConstraint.cpp \
  "$REF"/Src/CollisionDetection.cpp \
  "$REF"/Src/PrimitiveUtilities.cpp

echo "built $(pwd)/refbench"
