#!/bin/bash
# Fetch MNIST-M (keras_mnistm.pkl.gz) into the layout tpugan's MNIST-M
# loader reads (tpugan/data/sources.py:load_mnistm). The reference downloads
# this in-process (cogan/mnistm.py:22).
mkdir -p mnistm/raw
wget -N https://github.com/VanushVaswani/keras_mnistm/releases/download/1.0/keras_mnistm.pkl.gz -O mnistm/raw/keras_mnistm.pkl.gz
