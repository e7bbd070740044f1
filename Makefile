# Developer entry points.
#   make native    build the C++ graph builder
#   make test      run the full test suite (CPU, 8 virtual devices)
#   make bench     run the headline benchmark (real TPU if available)
#   make smoke     end-to-end CLI smoke run on the synthetic sample data

.PHONY: native test bench smoke clean

native:
	$(MAKE) -C native

test: native
	python -m pytest tests/ -q -n 2

bench:
	python bench.py

smoke:
	python train.py --cpu --id smoke --no-rnn --num_epoch 2 --hidden_dim 32 \
	  --batch_size 20 --effective_batch_size 20
	python eval.py saved_models/smoke --dataset test --cpu

clean:
	$(MAKE) -C native clean
	rm -rf saved_models/smoke
