python test.py --name pose --dataset_mode fewshot_pose \
  --adaptive_spade --warp_ref --spade_combine --remove_face_labels --finetune "$@"
