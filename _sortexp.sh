#!/bin/bash
for m in u64_32 u64_128 u32_64 u32_32 u64_16; do
  timeout 500 python /root/repo/_sortexp.py $m 2>/dev/null | tail -1 >> /root/repo/_sortexp_results.txt
done
echo DONE >> /root/repo/_sortexp_results.txt
