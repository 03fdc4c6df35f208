# pose (reference scripts/pose/train_g8.sh: bs 30, niter 100, niter_single 100)
python train.py --name pose --dataset_mode fewshot_pose \
  --adaptive_spade --warp_ref --spade_combine --remove_face_labels --add_face_D \
  --batchSize 30 --niter 100 --niter_single 100 --continue_train "$@"
