# canonical face 256 training (reference scripts/face/train_g1_256.sh);
# on TPU the global batch shards over all chips of the mesh automatically
# (reference used --batchSize 32 over 8 GPUs: scripts/face/train_g8_256.sh)
python train.py --name face_256 --dataset_mode fewshot_face \
  --adaptive_spade --warp_ref --spade_combine --batchSize 32 --continue_train "$@"
