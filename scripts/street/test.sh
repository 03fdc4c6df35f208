python test.py --name street --dataset_mode fewshot_street \
  --adaptive_spade --loadSize 512 --fineSize 512 "$@"
