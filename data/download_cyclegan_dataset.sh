#!/bin/bash
# Fetch an unpaired CycleGAN dataset and restructure it to the
# train/A train/B test/A test/B layout tpugan's unpaired loader reads
# (tpugan/data/im2im.py:load_unpaired_folders). Mirrors
# /root/reference/data/download_cyclegan_dataset.sh.
FILE=$1

DATASETS=(apple2orange summer2winter_yosemite horse2zebra monet2photo
          cezanne2photo ukiyoe2photo vangogh2photo maps cityscapes facades
          iphone2dslr_flower ae_photos)
ok=0
for d in "${DATASETS[@]}"; do
    [[ $FILE == "$d" ]] && ok=1
done
if [[ $ok == 0 ]]; then
    echo "Available datasets are: ${DATASETS[*]}"
    exit 1
fi

URL=https://people.eecs.berkeley.edu/~taesung_park/CycleGAN/datasets/$FILE.zip
ZIP_FILE=./$FILE.zip
TARGET_DIR=./$FILE
wget -N $URL -O $ZIP_FILE
unzip $ZIP_FILE -d .
rm $ZIP_FILE

mkdir -p "$TARGET_DIR/train" "$TARGET_DIR/test"
mv "$TARGET_DIR/trainA" "$TARGET_DIR/train/A"
mv "$TARGET_DIR/trainB" "$TARGET_DIR/train/B"
mv "$TARGET_DIR/testA" "$TARGET_DIR/test/A"
mv "$TARGET_DIR/testB" "$TARGET_DIR/test/B"
