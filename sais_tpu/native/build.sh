#!/usr/bin/env bash
# Build the native frame_pump shared library.
set -euo pipefail
cd "$(dirname "$0")"
CXX=${CXX:-g++}
FLAGS="$(pkg-config --cflags --libs opencv4 2>/dev/null ||
         echo "-I/usr/include/opencv4 -lopencv_core -lopencv_imgproc -lopencv_videoio")"
$CXX -O3 -shared -fPIC -std=c++17 frame_pump.cpp -o libframe_pump.so $FLAGS
echo "built $(pwd)/libframe_pump.so"
