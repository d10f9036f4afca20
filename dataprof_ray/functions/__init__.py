"""Pure, Ray-free kernels: type inference, date parsing, numeric stats, patterns, quality."""
