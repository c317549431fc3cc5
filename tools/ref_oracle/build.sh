#!/bin/bash
# Build the headless reference oracle against the UNMODIFIED reference tree.
# The only shadowed header is ui/FrameBuffer.h (Qt -> linear stub).
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${OUT:-$HERE/build}
mkdir -p "$OUT/obj"

SRCS=$(ls "$REF"/core/*.cpp "$REF"/accelerator/*.cpp "$REF"/shape/*.cpp \
          "$REF"/materials/*.cpp "$REF"/lights/*.cpp "$REF"/media/*.cpp \
          "$REF"/camera/*.cpp "$REF"/filters/*.cpp "$REF"/integrators/*.cpp \
          "$REF"/samplers/*.cpp "$REF"/textures/*.cpp | grep -v UnitTest)

CXXFLAGS="-std=c++17 -O2 -fopenmp -w -I$HERE/stub -I$REF -I$REF/3rd"

pids=()
OBJS=""
for s in $SRCS "$HERE/oracle_main.cpp"; do
  o="$OUT/obj/$(basename "${s%.cpp}").o"
  OBJS="$OBJS $o"
  if [ ! -f "$o" ] || [ "$s" -nt "$o" ] || [ "$HERE/stub/ui/FrameBuffer.h" -nt "$o" ]; then
    g++ $CXXFLAGS -c "$s" -o "$o" &
    pids+=($!)
  fi
done
for p in "${pids[@]}"; do wait "$p"; done

g++ $CXXFLAGS $OBJS -o "$OUT/oracle"
echo "built $OUT/oracle"
