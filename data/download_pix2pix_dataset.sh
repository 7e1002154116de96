#!/bin/bash
# Fetch a pix2pix paired dataset (facades, edges2shoes, maps, ...) into the
# layout tpugan's paired loader reads: <data_dir>/<name>/{train,val,test}/
# with side-by-side A|B images (tpugan/data/im2im.py:load_paired_folder).
# Mirrors /root/reference/data/download_pix2pix_dataset.sh.
FILE=$1
URL=https://people.eecs.berkeley.edu/~tinghuiz/projects/pix2pix/datasets/$FILE.tar.gz
TAR_FILE=./$FILE.tar.gz
TARGET_DIR=./$FILE/
wget -N $URL -O $TAR_FILE
mkdir -p $TARGET_DIR
tar -zxvf $TAR_FILE -C ./
rm $TAR_FILE
