from record_matching_ray.cli import main

main()
