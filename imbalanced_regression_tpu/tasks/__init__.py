"""Task plugins: end-to-end drivers for the four DIR benchmark suites,
sharing the unified trainer. Each module is runnable:
``python -m imbalanced_regression_tpu.tasks.age --dataset agedb --lds ...``"""
