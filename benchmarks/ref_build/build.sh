#!/bin/bash
# Build the reference oracle binary (sources read from /root/reference).
# Shims: cblas.h (no dev header in image), abs-rename wrapper TUs
# (gmres.h:21's global `abs` conflicts with modern libstdc++), -DNDEBUG
# (KernelFactory.cpp:9 asserts on a nonexistent variable).
set -e
cd "$(dirname "$0")"
CF="-O3 -DNDEBUG -march=native -fopenmp -DRUN_OMP -DBBFMM_CACHE -I shim -I /root/reference -I /root/reference/bbfmm"
for f in Aniso Geometry KernelFactory Quadrature; do
  g++ $CF -c /root/reference/$f.cpp -o $f.o
done
g++ $CF -c /root/reference/utility/config.cpp -o config.o
g++ $CF -c /root/reference/bbfmm/blas_wrapper.cpp -o blas_wrapper.o
g++ $CF -c gmres_tu.cpp -o gmres.o
g++ $CF -c main_tu.cpp -o main.o
g++ Aniso.o Geometry.o KernelFactory.o Quadrature.o config.o blas_wrapper.o gmres.o main.o \
    -o aniso2 -fopenmp -l:libblas.so.3 -lquadmath -lm
echo "built: $(pwd)/aniso2"
