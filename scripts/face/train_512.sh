# face 512 (reference scripts/face/train_g8_512.sh: bs 8, num_D 2)
python train.py --name face_512 --dataset_mode fewshot_face \
  --adaptive_spade --warp_ref --spade_combine --loadSize 512 --fineSize 512 \
  --num_D 2 --batchSize 8 --continue_train "$@"
