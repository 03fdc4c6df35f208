python test.py --name face_256 --dataset_mode fewshot_face \
  --adaptive_spade --warp_ref --spade_combine "$@"
