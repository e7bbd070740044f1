#!/bin/bash
# Download GloVe 840B.300d vectors for prepare_vocab.py
mkdir -p dataset/glove
cd dataset/glove
echo "==> Downloading glove vectors..."
wget http://nlp.stanford.edu/data/glove.840B.300d.zip
echo "==> Unzipping glove vectors..."
unzip glove.840B.300d.zip
rm glove.840B.300d.zip
echo "==> Done."
