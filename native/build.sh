#!/bin/sh
# Build the native state enumerator (optional accelerator; numpy fallback
# is always available).  Produces native/libprosper_enum.so, which
# core/states.py discovers via ctypes.
set -e
cd "$(dirname "$0")"
${CXX:-c++} -O2 -shared -fPIC -o libprosper_enum.so enumerate.cpp
echo "built $(pwd)/libprosper_enum.so"
