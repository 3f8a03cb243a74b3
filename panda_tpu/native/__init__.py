# Marker package so the native sources (panda_host.cpp, Makefile, and the
# built libpanda_host.so) ship with the wheel; the library is loaded by
# path from panda_tpu.interop.native, never imported.
