.PHONY: test bench tutorial perf native clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

tutorial:
	python tutorial/tutorial.py

perf:
	python -m tools.perf_probe

native:
	g++ -O3 -march=native -shared -fPIC -std=c++17 \
	  -o native/libdirloader.so native/loader.cc -ljpeg -lpthread

clean:
	rm -rf native/*.so __pycache__ **/__pycache__
