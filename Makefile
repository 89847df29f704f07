# Build the native host-side codec library (C++, loaded via ctypes).
# The framework works without it (numpy fallback); `make native` enables
# the compiled path. `make test` runs the suite, `make bench` the headline
# benchmark.

CXX      ?= g++
CXXFLAGS ?= -O3 -march=native -fPIC -shared -std=c++17 -Wall
NATIVE_SO = rabitq_tpu/_native.so

.PHONY: all native test bench clean

all: native

native: $(NATIVE_SO)

$(NATIVE_SO): native/packing.cpp
	$(CXX) $(CXXFLAGS) -o $@ $<

test:
	python -m pytest tests/ -q

bench:
	python bench.py

clean:
	rm -f $(NATIVE_SO)
